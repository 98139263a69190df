"""Compare a fresh bench.py JSON line against a recorded BENCH_r{N}.json.

Usage:
  python bench.py 2>/dev/null | python tools/bench_compare.py BENCH_r01.json
  python tools/bench_compare.py BENCH_r01.json fresh.json
"""

from __future__ import annotations

import json
import sys


def load(path_or_stdin):
    if path_or_stdin == "-":
        txt = sys.stdin.read()
    else:
        txt = open(path_or_stdin).read()
    # bench driver files wrap the line in {"n":..,"parsed": {...}} (and
    # may be pretty-printed across lines); accept a raw one-line JSON, a
    # whole-file JSON document, or any line whose object nests "queries".
    # bench.py (r8+) prints TWO lines — full detail, then a compact
    # tail-truncation-proof summary — so among parseable candidates
    # prefer the one with per-group query maps (the full line) over the
    # compact one, which carries totals only.
    candidates = [txt] + list(reversed([l for l in txt.splitlines() if l.strip()]))
    found = []
    for chunk in candidates:
        try:
            obj = json.loads(chunk)
        except json.JSONDecodeError:
            continue
        if not isinstance(obj, dict):
            continue
        if "queries" in obj:
            found.append(obj)
        for v in obj.values():
            if isinstance(v, dict) and "queries" in v:
                found.append(v)
    for obj in found:
        if "maintenance_queries" in obj:
            return obj
    if found:
        return found[0]
    raise SystemExit(f"no bench JSON found in {path_or_stdin}")


def main() -> None:
    base = load(sys.argv[1])
    fresh = load(sys.argv[2] if len(sys.argv) > 2 else "-")
    bq, fq = base["queries"], fresh["queries"]
    print(f"{'query':24s} {'base':>8s} {'fresh':>8s} {'ratio':>7s}")
    worse = []
    for name in sorted(set(bq) | set(fq)):
        b, f = bq.get(name), fq.get(name)
        if b is None or f is None:
            bs = "-" if b is None else f"{b:.3f}"
            fs = "-" if f is None else f"{f:.3f}"
            print(f"{name:24s} {bs:>8} {fs:>8}    new/gone")
            continue
        r = f / b if b else float("inf")
        flag = "  <-- slower" if r > 1.3 else ""
        if r > 1.3:
            worse.append(name)
        print(f"{name:24s} {b:8.3f} {f:8.3f} {r:6.2f}x{flag}")
    total_ratio = (
        f"{fresh['value'] / base['value']:6.2f}x" if base.get("value") else "   inf"
    )
    print(f"{'TOTAL':24s} {base['value']:8.3f} {fresh['value']:8.3f} {total_ratio}")
    # second headline group (r6+): compare when both sides carry it
    bm, fm = base.get("maintenance_queries"), fresh.get("maintenance_queries")
    if bm and fm:
        print(f"\n{'maintenance':24s} {'base':>8s} {'fresh':>8s} {'ratio':>7s}")
        for name in sorted(set(bm) | set(fm)):
            b, f = bm.get(name), fm.get(name)
            if b is None or f is None:
                continue
            r = f / b if b else float("inf")
            flag = "  <-- slower" if r > 1.3 else ""
            if r > 1.3:
                worse.append(name)
            print(f"{name:24s} {b:8.3f} {f:8.3f} {r:6.2f}x{flag}")
        print(
            f"{'MAINT TOTAL':24s} {base['maintenance_total']:8.3f} "
            f"{fresh['maintenance_total']:8.3f}"
        )
    # third headline group (r7+): the TPC-H relational family
    bt, ft = base.get("tpch_queries"), fresh.get("tpch_queries")
    if bt and ft:
        print(f"\n{'tpch':24s} {'base':>8s} {'fresh':>8s} {'ratio':>7s}")
        for name in sorted(set(bt) | set(ft)):
            b, f = bt.get(name), ft.get(name)
            if b is None or f is None:
                continue
            r = f / b if b else float("inf")
            flag = "  <-- slower" if r > 1.3 else ""
            if r > 1.3:
                worse.append(name)
            print(f"{name:24s} {b:8.3f} {f:8.3f} {r:6.2f}x{flag}")
        print(
            f"{'TPCH TOTAL':24s} {base['tpch_total']:8.3f} "
            f"{fresh['tpch_total']:8.3f}"
        )
    if worse:
        print("regressions (>1.3x):", ", ".join(worse))


if __name__ == "__main__":
    main()
