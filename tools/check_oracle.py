"""Local replica of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB at the given sf dir,
compare row-count + (sorted-column) values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]

Resource budget (r7, after the r6 sf0.1 sweep failures): the DuckDB
side runs under an explicit memory_limit (SPARK_GRAFT_DUCK_MEM, default
16GB) and spills to SPARK_GRAFT_DUCK_TMP (default /tmp/duck_spill) —
NOT $CWD/.tmp, where a runaway oracle previously filled the root disk.
r8: the two heaviest classifier mirrors (q_boss_grid_predict,
q_shotgun_ensemble_predict), which previously exceeded even the spill
cap at sf0.1, are sharded into staged temp-table scripts
(oracles_ml.py) and pass the full sweep under the default budget — no
exclusions are needed at any certified scale.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


# NULL timestamp sentinel: epoch timestamps are ~1.7e18 ns (positive),
# so a large negative int64 is unambiguous and sorts deterministically
_TS_NULL = -(2**62)


def _ts_to_micros(df: pd.DataFrame, c: str) -> None:
    """Rewrite a timestamp-valued column as exact int64 MICROS (NULL →
    sentinel). Two shapes arrive here: real datetime64 columns, and the
    valid_to-style bigint-ns-with-NULLs that pandas silently promotes
    to float64 — where float tolerance is poison: rtol=1e-9 at epoch-ns
    scale is ±1.7 s, wide enough to hide a real one-second drift behind
    an 'ok' verdict. Micros survive the float64 round-trip exactly
    (ulp at 1.7e18 is 256 ns < 0.5 us), so the compare is bit-exact."""
    s = df[c]
    if pd.api.types.is_datetime64_any_dtype(s):
        v = s.values.astype("datetime64[us]").astype("int64")
        df[c] = np.where(s.isna().to_numpy(), _TS_NULL, v)
        return
    v = s.to_numpy(dtype=float)
    nan = np.isnan(v)
    out = np.full(len(v), _TS_NULL, dtype=np.int64)
    out[~nan] = np.round(v[~nan] / 1000.0).astype(np.int64)
    df[c] = out


def _looks_like_epoch_ns(s: pd.Series) -> bool:
    """A float64 column whose non-NaN values are all integral and at
    epoch-ns magnitude (≥ 2^53, past float64's exact-integer range) is
    an int64 nanosecond timestamp that went through a NULL-promotion —
    nothing else in these schemas lives at 1e18."""
    if not np.issubdtype(s.dtype, np.floating):
        return False
    v = s.to_numpy()
    v = v[~np.isnan(v)]
    if len(v) == 0:
        return False
    return bool(np.all(np.abs(v) >= 2**53) and np.all(v == np.round(v)))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
        if pd.api.types.is_datetime64_any_dtype(df[c]) or _looks_like_epoch_ns(
            df[c]
        ):
            _ts_to_micros(df, c)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str:
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWCOUNT spark={len(spark_pdf)} duck={len(duck_pdf)}"
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        return f"COLUMNS spark={list(a.columns)} duck={list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            ok = np.allclose(
                av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True
            )
            # equal_nan: aligned NaNs are bit-equal for our purposes —
            # without it every nullable float column reported a
            # spurious OK~ (the r7 valid_to noise)
            exact = np.array_equal(
                av.astype(float), bv.astype(float), equal_nan=True
            )
            if not ok:
                bad = np.where(
                    ~np.isclose(av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-9)
                )[0][:3]
                return f"VALUES col={c} rows={bad.tolist()} spark={av[bad]} duck={bv[bad]}"
            if not exact:
                return f"OK~ (float col={c} close but not bit-equal)"
        else:
            if not np.array_equal(av, bv):
                bad = np.where(av != bv)[0][:3]
                return f"VALUES col={c} rows={bad.tolist()} spark={av[bad]} duck={bv[bad]}"
    return "OK"


def _budgeted_connection() -> "duckdb.DuckDBPyConnection":
    """A DuckDB connection with an explicit memory budget and a spill
    directory OFF the repo disk. Without these, the heaviest classifier
    mirrors at sf0.1 grow unbounded (shared box with the Spark JVM) and
    spill files land in $CWD/.tmp — which can fill the root disk."""
    import os
    import tempfile

    mem = os.environ.get("SPARK_GRAFT_DUCK_MEM", "16GB")
    tmp_root = os.environ.get("SPARK_GRAFT_DUCK_TMP", "/tmp/duck_spill")
    os.makedirs(tmp_root, exist_ok=True)
    # per-process subdir so concurrent sweeps don't share spill files
    tmp = tempfile.mkdtemp(prefix="oracle_", dir=tmp_root)
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute("SET max_temp_directory_size='40GB'")
    import atexit
    import shutil

    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    return con


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # positional names select queries; ^name excludes (kept as an
    # operator escape hatch — since r8's mirror sharding no registered
    # query needs excluding at any certified scale)
    only = {a for a in sys.argv[2:] if not a.startswith("^")}
    skip = {a[1:] for a in sys.argv[2:] if a.startswith("^")}

    import __spark_entry__ as E
    from sfa_spark.session import get_spark

    spark = get_spark("check-oracle")
    con = _budgeted_connection()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = E.queries()
    sqls = E.oracle_sql()
    failures = 0
    for name, fn in sorted(qs.items()):
        if (only and name not in only) or name in skip:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} SPARK-ERROR {type(exc).__name__}: {str(exc)[:200]}")
            failures += 1
            continue
        # teardown: a handful of operators cache intermediates
        # (incremental_lsh_dedup's banded, quantile_sketch's agg,
        # quality_classifier's j); over a 159-query sweep those
        # entries accumulate executor storage, so drop them between
        # queries rather than relying on LRU eviction.
        spark.catalog.clearCache()
        if name not in sqls:
            print(f"{name:24s} rows-only: {len(spdf)} rows  [{time.time()-t0:.1f}s]")
            if len(spdf) == 0:
                failures += 1
            continue
        try:
            dpdf = con.execute(sqls[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} DUCK-ERROR {type(exc).__name__}: {str(exc)[:200]}")
            failures += 1
            continue
        verdict = compare(spdf, dpdf)
        print(
            f"{name:24s} {verdict}  ({len(spdf)} rows)  [{time.time()-t0:.1f}s]"
        )
        if not verdict.startswith("OK"):
            failures += 1
    print(f"\n{'PASS' if failures == 0 else 'FAIL'} ({failures} failures)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
