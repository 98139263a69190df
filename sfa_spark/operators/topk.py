"""Global top-k with dense ranks, without a single-partition WindowExec.

orderBy().limit(k) plans as TakeOrderedAndProject — a parallel partial
top-k per partition merged on the driver, the shape that survives any
scale. Attaching rank 1..k afterwards with a window would need an empty
partition spec (Catalyst folds constant partition keys away), which
plans a single-partition WindowExec and logs the "No Partition Defined"
scale warning. For k rows the rank is instead a k×k ordered self-join:
rank(a) = #{b : b ≤ a in the total order} — a broadcast nested loop over
k² pairs, warning-free and engine-portable.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (column_name, descending?) specs
OrderSpec = list[tuple[str, bool]]


def _lex_before_or_eq(order: OrderSpec):
    """b ≤ a under the lexicographic order (strictly-before on some
    prefix, or equal on every key). Requires the order to be TOTAL
    (tie-broken by a unique key)."""
    strict = None
    eqs: list = []
    for name, desc in order:
        b, a = F.col(f"_b_{name}"), F.col(name)
        lt = (b > a) if desc else (b < a)
        for e in eqs:
            lt = e & lt
        strict = lt if strict is None else strict | lt
        eqs.append(F.col(f"_b_{name}") == F.col(name))
    all_eq = functools.reduce(operator.and_, eqs)
    return strict | all_eq


def ranked_top_k(df: DataFrame, order: OrderSpec, k: int) -> DataFrame:
    """Top k rows of df under `order` (a TOTAL order), with an int `rk`
    column 1..k. Plans as TakeOrderedAndProject + a k×k broadcast
    nested-loop self-join — no WindowExec anywhere."""
    cols = [F.col(n).desc() if d else F.col(n).asc() for n, d in order]
    top = df.orderBy(*cols).limit(int(k))
    b = top.select(
        *[F.col(n).alias(f"_b_{n}") for n, _ in order]
    )
    return (
        top.join(F.broadcast(b), _lex_before_or_eq(order))
        .groupBy(*df.columns)
        .agg(F.count(F.lit(1)).cast("int").alias("rk"))
    )
