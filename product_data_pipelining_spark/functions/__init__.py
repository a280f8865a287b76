"""Reusable column-level functions (all JVM-side, codegen-friendly).

Lazily re-exports the engine's scalar/array helpers (lazy to avoid a
circular import: operator modules import ``functions.rounding``).
"""

from typing import Any

__all__ = [
    "cosine",
    "dot",
    "duck_round",
    "marker_score",
    "minhash_signature",
    "norm",
    "shingles",
    "tokens",
]

_HOME = {
    "cosine": "product_data_pipelining_spark.operators.similarity",
    "dot": "product_data_pipelining_spark.operators.similarity",
    "norm": "product_data_pipelining_spark.operators.similarity",
    "duck_round": "product_data_pipelining_spark.functions.rounding",
    "marker_score": "product_data_pipelining_spark.operators.textops",
    "tokens": "product_data_pipelining_spark.operators.textops",
    "minhash_signature": "product_data_pipelining_spark.operators.dedup",
    "shingles": "product_data_pipelining_spark.operators.dedup",
}


def __getattr__(name: str) -> Any:
    if name in _HOME:
        import importlib

        return getattr(importlib.import_module(_HOME[name]), name)
    raise AttributeError(name)
