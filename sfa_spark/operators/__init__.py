"""Operator namespace — import submodules directly:

    from sfa_spark.operators import window, bags, tfidf, ...

Each module documents its reference parity (file:line into
/root/reference) and its scale behavior.
"""

from sfa_spark.operators import (  # noqa: F401
    bags,
    dedup,
    folds,
    knn,
    multimodal,
    quantize,
    select,
    sfa,
    similarity,
    text,
    tfidf,
    window,
    words,
)

__all__ = [
    "bags", "dedup", "folds", "knn", "multimodal", "quantize", "select",
    "sfa", "similarity", "text", "tfidf", "window", "words",
]
