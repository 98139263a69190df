"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (events → sliding z-norm → PAA →
                 equi-width SFA words → numerosity-reduced bags →
                 top-k patterns per entity) at sf0.001.
queries()      — one entry per implemented SURVEY §2 operator.
oracle_sql()   — matching DuckDB SQL for every SQL-expressible
                 operator; non-SQL ops (FFT-based transforms, full SFA
                 pipelines) are registered without an oracle and get
                 the driver's rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERY_MODULES = [
    "sfa_spark.queries",
    "sfa_spark.queries_text",
    "sfa_spark.queries_spectral",
    "sfa_spark.queries_index",
    "sfa_spark.queries_ml",
    "sfa_spark.queries_streaming",
]
ORACLE_MODULES = [
    "sfa_spark.oracles",
    "sfa_spark.oracles_text",
    "sfa_spark.oracles_ml",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sfa_spark import queries as Q

    return Q.q_bag_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    regs: dict[str, Callable] = {}
    for modname in QUERY_MODULES:
        try:
            mod = importlib.import_module(modname)
        except ImportError:
            continue
        regs.update(
            {
                name: fn
                for name, fn in vars(mod).items()
                if name.startswith("q_") and callable(fn)
            }
        )
    return regs


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for modname in ORACLE_MODULES:
        try:
            mod = importlib.import_module(modname)
        except ImportError:
            continue
        out.update(mod.ORACLES)
    return out
