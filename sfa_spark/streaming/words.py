"""Streaming SFA words: the flagship batch pipeline (sliding window →
per-window z-norm → PAA → equi-width quantize → packed word) running
INCREMENTALLY over a live event stream.

Pattern (SURVEY §2.9): fit offline, score online — the bins/stats are
fitted by the batch engine (tiny artifact, broadcast into the stream);
the stateful operator keeps the last w−1 values per series so windows
spanning micro-batch boundaries are emitted exactly once. This is the
MFT-style incremental computation expressed as
applyInPandasWithState (reference has no streaming runtime; README
motivates BOSS VS for "mining streaming data", README.md:239-242).

State per series: (pos seen so far, tail = last w−1 values). Late /
out-of-order data within a batch is sorted by event time; across
batches the file source must deliver in order (watermark semantics are
the batch layer's concern — documented extension).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

WORDS_OUTPUT = StructType(
    [
        StructField("series_id", LongType()),
        StructField("win", LongType()),
        StructField("word", LongType()),
    ]
)
WORDS_STATE = StructType(
    [
        StructField("pos", LongType()),
        StructField("tail", ArrayType(DoubleType())),
    ]
)


def window_words_numpy(
    vals: np.ndarray, w: int, l: int, a: int, stats: dict[int, tuple[float, float]]
) -> np.ndarray:
    """All windows of `vals` → packed words; mirrors the batch SQL chain
    exactly (window z-norm with 1e-8 guard, integer-segment PAA,
    equi-width clamp, 2-bit packing for a=4)."""
    if len(vals) < w:
        return np.zeros(0, dtype=np.int64)
    wins = np.lib.stride_tricks.sliding_window_view(vals, w)
    mean = wins.mean(axis=1, keepdims=True)
    std = wins.std(axis=1, keepdims=True)
    std = np.where(std < 1e-8, 1.0, std)
    z = (wins - mean) / std
    seg = z.reshape(len(wins), l, w // l).mean(axis=2)  # integer PAA (l | w)
    bits = max(1, (a - 1).bit_length())
    words = np.zeros(len(wins), dtype=np.int64)
    for i in range(l):
        vmin, vmax = stats[i]
        rng = vmax - vmin
        if rng < 1e-12:
            sym = np.zeros(len(wins), dtype=np.int64)
        else:
            sym = np.clip(
                np.floor((seg[:, i] - vmin) * a / rng), 0, a - 1
            ).astype(np.int64)
        words |= sym << (bits * i)
    return words


def stream_sfa_words(
    event_stream: DataFrame,
    stats: dict[int, tuple[float, float]],
    w: int = 16,
    l: int = 4,
    a: int = 4,
) -> DataFrame:
    """(user_id, ts, event_id, value) stream → (series_id, win, word).

    Each micro-batch emits exactly the windows that END inside it; the
    w−1 tail carries across batches in state.
    """

    def fn(key, pdfs, state: GroupState):
        (sid,) = key
        pos, tail = (state.get if state.exists else (0, []))
        tail = list(tail)
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        new = rows["value"].to_numpy(dtype=np.float64)
        if len(new) == 0:
            state.update((pos, tail))
            return
        concat = np.concatenate([np.asarray(tail, dtype=np.float64), new])
        words = window_words_numpy(concat, w, l, a, stats)
        base = pos - len(tail)  # absolute index of concat[0]
        out = pd.DataFrame(
            {
                "series_id": int(sid),
                "win": base + np.arange(len(words)),
                "word": words,
            }
        )
        # windows ending before this batch were emitted previously
        already = pos - w + 1  # first win whose end >= pos is pos-w+1
        out = out[out["win"] >= max(already, 0)] if pos >= w else out
        new_pos = pos + len(new)
        new_tail = concat[-(w - 1):].tolist() if len(concat) >= w - 1 else concat.tolist()
        state.update((int(new_pos), new_tail))
        if len(out):
            yield out

    return event_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=WORDS_OUTPUT,
        stateStructType=WORDS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def fit_equi_width_stats(coef_df) -> dict[int, tuple[float, float]]:
    """Offline fit: per-segment (min, max) of the batch PAA coefficients
    — the tiny artifact the stream broadcasts."""
    from pyspark.sql import functions as F

    rows = (
        coef_df.groupBy("seg")
        .agg(F.min("coef").alias("vmin"), F.max("coef").alias("vmax"))
        .collect()
    )
    return {r["seg"]: (r["vmin"], r["vmax"]) for r in rows}
