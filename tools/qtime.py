"""Per-query isolation harness (guide §1): time one or more queries on
a warm session with the noop sink and capture their .explain("formatted")
output.

Usage:
  python tools/qtime.py [--sf DIR] [--runs N] [--explain-dir DIR]
                        [--action noop|count] q_name [q_name ...]

Differences vs bench.py (which stays the round-over-round series):
  * noop sink by default — computes EVERY column (bench's .count() lets
    the optimizer prune), so this measures the full computation.
  * per-query explain dump for the plans/rNN before/after artifacts.
  * no load gate — this is a relative A/B tool, not a series artifact.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--action", choices=["noop", "count"], default="noop")
    ap.add_argument(
        "--warmup-sf",
        default=None,
        help="scale dir for the JIT warmup run (default: the smallest "
        "sf* sibling of --sf; pass --sf itself to warm at full scale)",
    )
    args = ap.parse_args()

    import __spark_entry__ as E
    from sfa_spark.session import get_spark

    spark = get_spark("qtime")
    qs = E.queries()

    # one warmup to move JVM JIT/codegen out of the first measured run,
    # at the smallest available scale dir (the old sf-name string
    # replace silently warmed at FULL scale for any --sf other than
    # sf0.1 and mangled names like sf0.12)
    warm_sf = args.warmup_sf
    if warm_sf is None:
        parent = os.path.dirname(os.path.abspath(args.sf))
        sizes = []
        for d in os.listdir(parent) if os.path.isdir(parent) else []:
            if d.startswith("sf") and os.path.isdir(os.path.join(parent, d)):
                try:
                    sizes.append((float(d[2:]), os.path.join(parent, d)))
                except ValueError:
                    continue
        warm_sf = min(sizes)[1] if sizes else args.sf
    if args.queries[0] in qs:
        try:
            qs[args.queries[0]](spark, warm_sf).count()
        except Exception as exc:  # noqa: BLE001 — warmup is best-effort,
            # but surface the failure instead of hiding it
            print(
                f"warmup failed ({type(exc).__name__}): {exc}",
                file=sys.stderr,
                flush=True,
            )
    spark.catalog.clearCache()

    for name in args.queries:
        if name not in qs:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        samples = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            df = qs[name](spark, args.sf)
            t0 = time.time()
            if args.action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: min={min(samples)} runs={samples}", flush=True)


if __name__ == "__main__":
    main()
