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
    # bench driver files wrap the line in {"n":..,"out": "..."} sometimes;
    # accept either a raw line or a file whose last JSON object has "queries"
    for line in reversed([l for l in txt.splitlines() if l.strip()]):
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "queries" in obj:
            return obj
        if isinstance(obj, dict):
            for v in obj.values():
                if isinstance(v, dict) and "queries" in v:
                    return v
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
            print(f"{name:24s} {b or '-':>8} {f or '-':>8}    new/gone")
            continue
        r = f / b if b else float("inf")
        flag = "  <-- slower" if r > 1.3 else ""
        if r > 1.3:
            worse.append(name)
        print(f"{name:24s} {b:8.3f} {f:8.3f} {r:6.2f}x{flag}")
    print(
        f"{'TOTAL':24s} {base['value']:8.3f} {fresh['value']:8.3f} "
        f"{fresh['value'] / base['value']:6.2f}x"
    )
    if worse:
        print("regressions (>1.3x):", ", ".join(worse))


if __name__ == "__main__":
    main()
