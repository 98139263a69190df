"""SFA word packing & PAA (SURVEY §2.3 T6, §2.4 Q7).

Reference parity:
  * PAA          — PAA.transform (`/root/reference/src/main/java/sfa/transformation/PAA.java:28-50`)
  * word packing — Words.createWord / Classifier.createWord
                   (`/root/reference/src/main/java/sfa/classification/Classifier.java:163-192`)
                   binlog(alphabet) bits per symbol, low coefficient in
                   the low bits, packed into one bigint.

bigint word keys are deliberate: they shuffle/compare as primitives
(Tungsten-optimal), exactly why the reference bit-packs too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binlog(alphabet: int) -> int:
    bits = 0
    a = alphabet - 1
    while a > 0:
        bits += 1
        a >>= 1
    return max(bits, 1)


def paa_long(win_long: DataFrame, w: int, l: int, value_col: str = "value_z") -> DataFrame:
    """PAA over exploded windows: l segment means per (series, win).

    seg = floor(off*l/w); exact reference semantics when l | w (the
    fractional-frame case falls back to this integer mapping; the
    spectral pandas_udf path implements exact fractional PAA).
    Pure groupBy — map-side partial aggregation, one shuffle on
    (series_id, win) that downstream packing reuses.
    """
    return (
        win_long.withColumn(
            "seg", F.floor(F.col("off") * l / w).cast("int")
        )
        .groupBy("series_id", "win", "seg")
        .agg(F.avg(value_col).alias("coef"))
    )


def pack_words(
    sym_long: DataFrame, alphabet: int, keys: tuple[str, ...] = ()
) -> DataFrame:
    """(series_id, win, seg, symbol[, *keys]) → (series_id, win, word).

    word = Σ symbol_seg << (bits·seg). Disjoint bit ranges, so SUM is a
    bit-OR; pure SQL aggregate. `keys` carry grid columns.
    """
    bits = binlog(alphabet)
    return (
        sym_long.groupBy("series_id", *keys, "win")
        .agg(
            F.sum(
                F.expr(f"shiftleft(cast(symbol as bigint), {bits} * seg)")
            ).alias("word")
        )
    )


def unpack_word(word_col_name: str, length: int, alphabet: int):
    """Column expression: bigint word column (by name) → array<int>."""
    bits = binlog(alphabet)
    mask = (1 << bits) - 1
    return F.expr(
        f"transform(sequence(0, {length - 1}), "
        f"i -> cast(shiftright({word_col_name}, cast(i * {bits} as int)) & {mask} as int))"
    )


def mask_word(word_col, length: int, alphabet: int):
    """Truncate a packed word to its first `length` symbols — the BOSS
    f-grid re-masks one word table per f instead of recomputing
    (BOSS.java:125: word & ((1<<(bits*len))-1))."""
    bits = binlog(alphabet)
    return word_col.bitwiseAND(F.lit((1 << (bits * length)) - 1))
