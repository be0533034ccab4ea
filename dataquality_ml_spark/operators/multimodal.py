"""Multimodal column plumbing (SURVEY.md §7 step 9: image/audio/video as
opaque ``binary`` columns with typed metadata).

The Spark-side mechanics — schema, partitioning, Arrow batch shape, UDF
signatures — are real and tested.  Image decoding is REAL-WHEN-IMPORTABLE
(``decode_image``: PIL when the executor can import it, contract-tested
against a fake module; ``decode_stub`` is the deterministic fallback this
container uses because it ships no image/audio libraries).  Video demux
is likewise REAL-WHEN-IMPORTABLE (``demux_frames``: PyAV when the
executor can import it, fake-av contract-tested; ``frame_stub`` is the
fallback).  Header-level metadata parsing (PNG/GIF/JPEG) is always real.  Audio
decode is REAL-WHEN-IMPORTABLE too (``decode_audio``: soundfile when the
executor can import it, fake-soundfile contract-tested; ``audio_stub``
is the fallback) — no media path remains stub-only.  The batch iterator
contract
(``mapInPandas`` over binary + metadata columns, bounded batches via
maxRecordsPerBatch) is exactly what a real decoder needs at 100 TB —
media bytes never leave the executor, only fixed-width features come
back.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: schema of the decoded-feature output (id + fixed-width feature vector)
FEATURE_SCHEMA = "id long, width int, height int, n_bytes long, features array<float>"


def attach_binary_metadata(
    df: DataFrame, bin_col: str, id_col: str
) -> DataFrame:
    """Typed metadata for an opaque binary column — pure JVM expressions:
    payload size, content hash (dedup key), magic-byte sniff."""
    b = F.col(bin_col)
    return df.select(
        F.col(id_col),
        F.length(b).alias("n_bytes"),
        F.md5(b).alias("content_hash"),
        F.substring(F.hex(b), 1, 8).alias("magic"),
    )


def decode_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic fake decoder standing in for an image library.

    Raises ``NotImplementedError`` for empty payloads (the real-decoder
    failure path callers must handle); otherwise derives a fake
    (width, height) and an 8-dim feature vector from the bytes. Replace
    with a real decode (PIL / torchvision / ffmpeg) in production.
    """
    if not payload:
        raise NotImplementedError("empty payload: no media decoder in this environment")
    w = 16 + payload[0] % 64
    h = 16 + payload[-1] % 64
    arr = np.frombuffer(payload, dtype=np.uint8)
    feats = np.array(
        [
            arr.mean(),
            arr.std(),
            arr.min(),
            arr.max(),
            float(len(arr)),
            float(w),
            float(h),
            float(arr.sum() % 997),
        ],
        dtype=np.float32,
    )
    return w, h, feats


def _image_features(w: int, h: int, arr: np.ndarray) -> np.ndarray:
    """The fixed 8-dim feature vector both decode paths emit — shared so
    the stub and the real decoder honor the SAME output contract (only
    the array's provenance differs: raw payload bytes vs decoded
    grayscale pixels)."""
    return np.array(
        [
            arr.mean(),
            arr.std(),
            arr.min(),
            arr.max(),
            float(len(arr)),
            float(w),
            float(h),
            float(arr.sum() % 997),
        ],
        dtype=np.float32,
    )


def decode_image(payload: bytes, pil_module=None) -> tuple[int, int, np.ndarray]:
    """REAL image decode when an imaging library is available (VERDICT r7
    item 7 — the ``keras_adapter`` real-when-importable pattern): open the
    payload with PIL, convert to grayscale, and emit (width, height,
    8-dim pixel features) under the exact ``decode_stub`` contract —
    same tuple shape, same feature semantics, ``NotImplementedError``
    on empty/undecodable payloads (the skip path callers already handle).

    ``pil_module`` is the injectable dependency (tests pass a fake PIL;
    production leaves None for the real ``import PIL``). The container
    this repo ships in has no imaging library — the fake-module contract
    test is what pins the real path's behavior, mirroring
    tests/test_keras_adapter.py's fake-keras."""
    import io

    if not payload:
        raise NotImplementedError("empty payload: nothing to decode")
    if pil_module is None:
        import PIL.Image  # noqa: PLC0415 — the optional dependency gate
        import PIL

        pil_module = PIL
    try:
        img = pil_module.Image.open(io.BytesIO(payload))
        img = img.convert("L")
        w, h = img.size
        arr = np.asarray(img, dtype=np.uint8).ravel()
    except NotImplementedError:
        raise
    except Exception as e:  # undecodable bytes → the documented skip path
        raise NotImplementedError(f"payload not decodable: {e}") from e
    return w, h, _image_features(w, h, arr)


def decode_features(
    df: DataFrame, bin_col: str, id_col: str, decoder: str = "auto"
) -> DataFrame:
    """Decode + feature-extract over binary payloads via ``mapInPandas``:
    per-partition Arrow batches in, fixed-width feature rows out. Corrupt /
    empty payloads are skipped (counted rows lost = input − output).

    ``decoder``: ``"auto"`` uses the REAL PIL decode (``decode_image``)
    when PIL imports ON THE EXECUTOR, falling back to the deterministic
    ``decode_stub`` otherwise — so the same pipeline code runs real
    pixels in a media-enabled cluster and stays testable here;
    ``"pil"`` requires PIL (fails loudly); ``"stub"`` forces the fake.
    The import attempt happens inside the worker (once per batch
    iterator), never on the driver, and no module object rides the
    closure."""
    if decoder not in ("auto", "pil", "stub"):
        raise ValueError("decoder must be auto|pil|stub")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_pil = False
        if decoder in ("auto", "pil"):
            try:
                import PIL.Image  # noqa: F401,PLC0415
                import PIL  # noqa: F401,PLC0415

                use_pil = True
            except ImportError:
                if decoder == "pil":
                    raise
        for pdf in batches:
            out = {"id": [], "width": [], "height": [], "n_bytes": [], "features": []}
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    if use_pil:
                        w, h, feats = decode_image(raw)
                    else:
                        w, h, feats = decode_stub(raw)
                except NotImplementedError:
                    continue
                out["id"].append(rid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(payload))
                out["features"].append(feats.tolist())
            # a batch where every payload was skipped yields nothing: an
            # empty pandas frame types 'features' float64, which Arrow
            # cannot convert to list<float>
            if out["id"]:
                yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(decode, schema=FEATURE_SCHEMA)


#: schema of the frame-sampling output — one row PER SAMPLED FRAME
FRAME_SCHEMA = "id long, frame_idx int, n_frames int, frame_bytes binary"


def frame_stub(payload: bytes) -> list[bytes]:
    """Deterministic fake video demuxer: treats the payload as fixed-size
    'frames' of 16 bytes. Raises for empty payloads like ``decode_stub``.
    Replace with ffmpeg/PyAV demuxing in production — the operator contract
    (one input row → many frame rows, bytes stay executor-local) is what
    matters here."""
    if not payload:
        raise NotImplementedError("empty payload: no media decoder in this environment")
    size = 16
    return [payload[i : i + size] for i in range(0, len(payload), size)]


def demux_frames(payload: bytes, av_module=None) -> list[bytes]:
    """REAL video demux when PyAV is importable (round 9 — the
    ``decode_image`` real-when-importable pattern applied to the video
    stub): open the payload as a media container, decode video stream 0,
    and emit each frame's grayscale pixel buffer as bytes — the exact
    ``frame_stub`` contract (``list[bytes]``; ``NotImplementedError`` on
    empty / undecodable / frameless payloads, the documented skip path).

    ``av_module`` is the injectable dependency (tests pass a fake av;
    production leaves None for the real ``import av``). The container
    this repo ships in has no media library — the fake-module contract
    test pins the real path's behavior, exactly like fake-PIL pins
    ``decode_image``."""
    import io

    if not payload:
        raise NotImplementedError("empty payload: nothing to demux")
    if av_module is None:
        import av  # noqa: PLC0415 — the optional dependency gate

        av_module = av
    try:
        container = av_module.open(io.BytesIO(payload))
        frames = [
            np.asarray(f.to_ndarray(format="gray"), dtype=np.uint8).tobytes()
            for f in container.decode(video=0)
        ]
    except NotImplementedError:
        raise
    except Exception as e:  # undecodable bytes → the documented skip path
        raise NotImplementedError(f"payload not demuxable: {e}") from e
    if not frames:
        raise NotImplementedError("no video frames in payload")
    return frames


def sample_frames(
    df: DataFrame, bin_col: str, id_col: str, every_n: int = 2,
    demuxer: str = "auto",
) -> DataFrame:
    """Frame sampling for video-like payloads via ``mapInPandas``: demux
    each binary into frames, keep every ``every_n``-th, and emit
    ONE ROW PER KEPT FRAME — a 1→many expansion inside the Arrow batch
    iterator, which is the shape a real ffmpeg sampler needs (frames are
    produced and filtered executor-side; the driver only ever sees the
    plan). Downstream per-frame decode/dedup composes by joining on
    (id, frame_idx).

    ``demuxer``: ``"auto"`` uses the REAL PyAV demux (``demux_frames``)
    when ``av`` imports ON THE EXECUTOR, falling back to the
    deterministic ``frame_stub`` otherwise (the ``decode_features``
    auto|pil|stub pattern); ``"av"`` requires PyAV (fails loudly);
    ``"stub"`` forces the fake. The import attempt happens inside the
    worker, never on the driver, and no module object rides the
    closure."""
    if demuxer not in ("auto", "av", "stub"):
        raise ValueError("demuxer must be auto|av|stub")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_av = False
        if demuxer in ("auto", "av"):
            try:
                import av  # noqa: F401,PLC0415

                use_av = True
            except ImportError:
                if demuxer == "av":
                    raise
        for pdf in batches:
            out = {"id": [], "frame_idx": [], "n_frames": [], "frame_bytes": []}
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    frames = demux_frames(raw) if use_av else frame_stub(raw)
                except NotImplementedError:
                    continue
                for i in range(0, len(frames), every_n):
                    out["id"].append(rid)
                    out["frame_idx"].append(i)
                    out["n_frames"].append(len(frames))
                    out["frame_bytes"].append(frames[i])
            if out["id"]:  # same all-skipped Arrow-typing guard as decode
                yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(sample, schema=FRAME_SCHEMA)


#: schema of the audio-feature output (id + fixed-width descriptor)
AUDIO_SCHEMA = (
    "id long, sample_rate int, n_samples long, duration double, "
    "features array<float>"
)


def audio_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic fake audio decoder standing in for a sound library:
    (sample_rate, n_samples, mono float waveform in [-1, 1]) derived from
    the bytes. Raises ``NotImplementedError`` for empty payloads — the
    same skip contract as ``decode_stub`` / ``frame_stub``."""
    if not payload:
        raise NotImplementedError("empty payload: no media decoder in this environment")
    rate = 8000 + (payload[0] % 5) * 8000  # 8/16/24/32/40 kHz
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    wave = (arr - 127.5) / 127.5
    return rate, len(wave), wave


def _audio_features(rate: int, wave: np.ndarray) -> np.ndarray:
    """Fixed 8-dim audio descriptor both decode paths emit (the
    ``_image_features`` twin): amplitude stats + RMS energy +
    zero-crossing rate + duration — the quality/dedup signals an audio
    curation pass filters on before any model sees a waveform."""
    n = len(wave)
    zc = float(np.count_nonzero(np.diff(np.signbit(wave)))) / max(n - 1, 1)
    return np.array(
        [
            wave.mean(),
            wave.std(),
            wave.min(),
            wave.max(),
            float(np.sqrt(np.mean(wave * wave))),  # RMS energy
            zc,
            float(rate),
            n / float(rate),  # duration (s)
        ],
        dtype=np.float32,
    )


def decode_audio(payload: bytes, sf_module=None) -> tuple[int, int, np.ndarray]:
    """REAL audio decode when a sound library is available (round 9 —
    the ``decode_image``/``demux_frames`` real-when-importable pattern,
    closing the last media stub): read the payload with ``soundfile``,
    mono-mix multi-channel data, and return (sample_rate, n_samples,
    mono float waveform) under the exact ``audio_stub`` contract —
    ``NotImplementedError`` on empty/undecodable payloads.

    ``sf_module`` is the injectable dependency (tests pass a fake
    soundfile; production leaves None for the real ``import soundfile``).
    """
    import io

    if not payload:
        raise NotImplementedError("empty payload: nothing to decode")
    if sf_module is None:
        import soundfile  # noqa: PLC0415 — the optional dependency gate

        sf_module = soundfile
    try:
        data, rate = sf_module.read(io.BytesIO(payload))
        wave = np.asarray(data, dtype=np.float64)
        if wave.ndim > 1:
            wave = wave.mean(axis=1)  # mono mix
    except NotImplementedError:
        raise
    except Exception as e:  # undecodable bytes → the documented skip path
        raise NotImplementedError(f"payload not decodable: {e}") from e
    if len(wave) == 0:
        raise NotImplementedError("no audio samples in payload")
    return int(rate), len(wave), wave


def audio_features(
    df: DataFrame, bin_col: str, id_col: str, decoder: str = "auto"
) -> DataFrame:
    """Audio decode + fixed-width descriptor over binary payloads via
    ``mapInPandas`` — the audio member of the decode family
    (``decode_features`` images / ``sample_frames`` video): waveforms
    never leave the executor, only the 8-dim descriptor + timing
    metadata come back. Corrupt/empty payloads are skipped.

    ``decoder``: ``"auto"`` uses the REAL soundfile decode when it
    imports ON THE EXECUTOR, else the deterministic ``audio_stub``;
    ``"soundfile"`` requires the library (fails loudly); ``"stub"``
    forces the fake."""
    if decoder not in ("auto", "soundfile", "stub"):
        raise ValueError("decoder must be auto|soundfile|stub")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_sf = False
        if decoder in ("auto", "soundfile"):
            try:
                import soundfile  # noqa: F401,PLC0415

                use_sf = True
            except ImportError:
                if decoder == "soundfile":
                    raise
        for pdf in batches:
            out = {
                "id": [], "sample_rate": [], "n_samples": [],
                "duration": [], "features": [],
            }
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    rate, n, wave = (
                        decode_audio(raw) if use_sf else audio_stub(raw)
                    )
                except NotImplementedError:
                    continue
                out["id"].append(rid)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration"].append(n / float(rate))
                out["features"].append(_audio_features(rate, wave).tolist())
            if out["id"]:  # same all-skipped Arrow-typing guard as decode
                yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(decode, schema=AUDIO_SCHEMA)


#: schema of the header-parse output
IMAGE_META_SCHEMA = "id long, format string, width int, height int"


def parse_image_header(payload: bytes):
    """REAL (not stubbed) image metadata: container format and pixel
    dimensions parsed straight from header bytes — PNG IHDR, GIF logical
    screen descriptor, JPEG SOF scan — no image library required. Returns
    (format, width, height); unknown/corrupt payloads → ("unknown", None,
    None). This is the part of 'decode' a metadata pipeline actually
    needs (resolution filters, aspect-ratio buckets, thumbnail budgets)
    and it works in this container today, unlike pixel decoding."""
    if payload is None or len(payload) < 10:
        return ("unknown", None, None)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return ("png", w, h)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return ("gif", w, h)
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            # SOF0-15 carry dimensions, except DHT/JPG/DAC (C4/C8/CC)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            i += 2 + seg_len
        return ("jpeg", None, None)  # JPEG without a parseable SOF
    return ("unknown", None, None)


def image_metadata(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Header-level image metadata over a binary column via mapInPandas —
    same Arrow-batched executor-local contract as ``decode_features``,
    but the parse is real: format + dimensions from PNG/GIF/JPEG headers.
    Every input row comes back (unknown formats carry null dims), so
    joins against the source table never lose rows."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "format": [], "width": [], "height": []}
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                fmt, w, h = parse_image_header(
                    bytes(payload) if payload is not None else None
                )
                out["id"].append(rid)
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
            yield pd.DataFrame(out)

    return df.select(id_col, bin_col).mapInPandas(parse, schema=IMAGE_META_SCHEMA)
