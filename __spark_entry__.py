"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (events → sliding z-norm → PAA →
                 equi-width SFA words → numerosity-reduced bags →
                 top-k patterns per entity) at sf0.001.
queries()      — one entry per implemented SURVEY §2 operator.
oracle_sql()   — matching DuckDB SQL (sfa_spark/oracles.py) for every
                 SQL-expressible operator; non-SQL ops (FFT-based
                 transforms) are registered without an oracle and get
                 the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sfa_spark import oracles
from sfa_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q_bag_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    regs = {
        name: fn
        for name, fn in vars(Q).items()
        if name.startswith("q_") and callable(fn)
    }
    try:
        from sfa_spark import queries_text as QT

        regs.update(
            {
                name: fn
                for name, fn in vars(QT).items()
                if name.startswith("q_") and callable(fn)
            }
        )
    except ImportError:
        pass
    try:
        from sfa_spark import queries_spectral as QS

        regs.update(
            {
                name: fn
                for name, fn in vars(QS).items()
                if name.startswith("q_") and callable(fn)
            }
        )
    except ImportError:
        pass
    return regs


def oracle_sql() -> dict[str, str]:
    out = dict(oracles.ORACLES)
    try:
        from sfa_spark import oracles_text

        out.update(oracles_text.ORACLES)
    except ImportError:
        pass
    return out
