"""Sweep the kernel tuning knobs on TPU and rank configurations.

Each (ORT_SUBTILES, ORT_CHUNK_GROUP, ORT_MT_PRECISION, ORT_SWIZZLE)
combination runs `perf_report.py --child <case>` in a fresh process
(the knobs are read at import).  Defaults sweep the baseline BVH frame;
set TUNE_CASE to any perf_report case.

Usage: python scripts/tune_knobs.py            # default grid
       TUNE_CASE=trace_shadow6 python scripts/tune_knobs.py
"""

import itertools
import json
import os
import subprocess
import sys

CASE = os.environ.get("TUNE_CASE", "frame_baseline_bvh")
SUBTILES = [16, 32, 64]
GROUPS = [2, 4, 8]
PRECISION = ["highest", "mixed"]
SWIZZLE = ["1", "0"]
TIMEOUT = int(os.environ.get("TUNE_TIMEOUT", "420"))
BUDGET = int(os.environ.get("TUNE_BUDGET", "3000"))


def main() -> int:
    import time
    t0 = time.time()
    report = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "perf_report.py")
    rows = []
    # precision/swizzle first (biggest expected effect), then tile knobs
    # at the winning precision
    grid = ([(32, 4, p, s) for p in PRECISION for s in SWIZZLE]
            + [(st, g, PRECISION[0], "1")
               for st, g in itertools.product(SUBTILES, GROUPS)
               if (st, g) != (32, 4)])
    for st, g, prec, sw in grid:
        if time.time() - t0 > BUDGET:
            print("budget exhausted")
            break
        env = dict(os.environ, ORT_SUBTILES=str(st), ORT_CHUNK_GROUP=str(g),
                   ORT_MT_PRECISION=prec, ORT_SWIZZLE=sw)
        try:
            out = subprocess.run(
                [sys.executable, report, "--child", CASE],
                capture_output=True, timeout=TIMEOUT, text=True, env=env)
            lines = [ln for ln in out.stdout.splitlines()
                     if ln.startswith("{")]
            res = (json.loads(lines[-1]) if lines
                   else {"error": f"rc={out.returncode}"})
        except subprocess.TimeoutExpired:
            res = {"error": "timeout"}
        row = {"subtiles": st, "group": g, "precision": prec,
               "swizzle": sw, **res}
        rows.append(row)
        print(json.dumps(row), flush=True)
    ok = [r for r in rows if "ms" in r]
    if ok:
        best = min(ok, key=lambda r: r["ms"])
        print("BEST:", json.dumps(best))
    return 0


if __name__ == "__main__":
    sys.exit(main())
