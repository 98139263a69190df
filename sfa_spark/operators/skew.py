"""Skew-mitigated equi-join (salting).

AQE's skew-join (on in session.py) splits oversized sort-merge
partitions at runtime and handles moderate skew for free. Salting is
the explicit form for the extreme case it cannot fix: ONE key so hot
that even a split partition's build/probe for that key exceeds a
task's memory, or a non-SMJ plan where AQE's splitter does not apply.

Mechanics: every left row gets a salt in [0, n_salts) from its
per-partition ROW POSITION (monotonically_increasing_id mod n) — any
assignment is output-correct, and a positional salt spreads even a
hot key made of IDENTICAL rows, where a content hash would send every
copy to the same reducer (the exact pathology being mitigated); the
right side is replicated n_salts× with one copy per salt; the join
key becomes (key, salt), so a hot key's rows spread over n_salts
reducers instead of one. Cost: right-side
volume × n_salts — use when |right| ≪ |left| but too big to
broadcast (the broadcast join needs no salt at all; groupBy needs
none either, map-side partial aggregation already bounds reducer
input to one row per key per map partition).

Output is EXACTLY the plain equi-join (tests collect-compare both and
assert the physical join keys carry the salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `left` (skewed, large) with `right` (replicated) on
    left_key = right_key, spread over n_salts sub-keys. Supports
    'inner' and 'left' (right-side replication preserves left-join
    semantics: each left row still sees every matching right row
    exactly once — only the copy with its own salt survives)."""
    assert how in ("inner", "left"), f"unsupported how={how}"
    right_key = right_key or left_key
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast(
        "int"
    )
    lhs = left.withColumn("_salt", salt)
    rhs = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(int(i)) for i in range(n_salts)]))
    )
    cond = (lhs[left_key] == rhs[right_key]) & (lhs["_salt"] == rhs["_salt"])
    joined = lhs.join(rhs, cond, how)
    # drop the salts; drop the right key column only when it shadows
    # the left one (same name)
    keep = [lhs[c] for c in left.columns] + [
        rhs[c].alias(c)
        for c in right.columns
        if not (c == right_key and right_key == left_key)
    ]
    return joined.select(*keep)
