from dataquality_ml_spark.functions.scalar import (
    bow_fingerprint,
    normalize_text,
    portable_hash32,
    shingles,
    tokens,
)

__all__ = [
    "bow_fingerprint",
    "normalize_text",
    "portable_hash32",
    "shingles",
    "tokens",
]
