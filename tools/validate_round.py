"""One-shot round validation: oracle gate at sf0.001 + sf0.01 (+
optionally sf0.1), then bench. Exit code 0 only if everything passes.

Usage: python tools/validate_round.py [--full]
"""

from __future__ import annotations

import subprocess
import sys


def run(cmd: list[str]) -> int:
    print(f"\n=== {' '.join(cmd)}", flush=True)
    return subprocess.call(cmd)


def main() -> int:
    full = "--full" in sys.argv
    rc = 0
    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"] + (
        ["/root/testdata/sf0.1"] if full else []
    ):
        rc |= run([sys.executable, "tools/check_oracle.py", sf])
    rc |= run([sys.executable, "bench.py"])
    print(f"\n{'ROUND VALIDATION PASS' if rc == 0 else 'ROUND VALIDATION FAIL'}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
