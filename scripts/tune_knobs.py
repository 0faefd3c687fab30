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
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from childproc import run_child, probe_alive  # noqa: E402

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
    if not probe_alive():
        print(json.dumps({"note": "liveness probe failed; aborting sweep"}),
              flush=True)
        return 1
    report = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "perf_report.py")
    rows = []

    def run(st, g, prec, sw, sparse="1"):
        env = dict(os.environ, ORT_SUBTILES=str(st), ORT_CHUNK_GROUP=str(g),
                   ORT_MT_PRECISION=prec, ORT_SWIZZLE=sw,
                   ORT_SPARSE_GRID=sparse)
        res = run_child([sys.executable, report, "--child", CASE],
                        TIMEOUT, env)
        row = {"subtiles": st, "group": g, "precision": prec,
               "swizzle": sw, "sparse": sparse, **res}
        rows.append(row)
        print(json.dumps(row), flush=True)
        return row

    # phase 0: sparse-grid A/B at all-default knobs
    for sp in ("1", "0"):
        if time.time() - t0 > BUDGET:
            print("budget exhausted")
            break
        run(32, 4, "highest", "1", sparse=sp)

    # phase 0b: accum boundary layout A/B (r3: ORT_ACCUM_PLANES — the
    # [H,W,4] minor-dim HBM padding question, see layout_probe.py)
    if time.time() - t0 <= BUDGET:
        env = dict(os.environ, ORT_ACCUM_PLANES="1")
        res = run_child([sys.executable, report, "--child", CASE],
                        TIMEOUT, env)
        row = {"accum_planes": "1", **res}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # phase 1: precision/swizzle at the default tile knobs
    for p, s in itertools.product(PRECISION, SWIZZLE):
        if (p, s) == ("highest", "1"):
            continue  # measured in phase 0
        if time.time() - t0 > BUDGET:
            print("budget exhausted")
            break
        run(32, 4, p, s)
    # pick the phase-1 winner among LIKE-FOR-LIKE rows (sparse on): the
    # phase-0 sparse=0 control must not leak its precision/swizzle into
    # the tile sweep
    ok1 = [r for r in rows if "ms" in r and r.get("sparse") == "1"]
    if ok1:
        best1 = min(ok1, key=lambda r: r["ms"])
        best_prec, best_sw = best1["precision"], best1["swizzle"]
    else:
        best_prec, best_sw = PRECISION[0], "1"

    # phase 2: tile knobs at the phase-1 winning precision AND swizzle
    for st, g in itertools.product(SUBTILES, GROUPS):
        if (st, g) == (32, 4):
            continue
        if time.time() - t0 > BUDGET:
            print("budget exhausted")
            break
        run(st, g, best_prec, best_sw)

    ok = [r for r in rows if "ms" in r]
    if ok:
        best = min(ok, key=lambda r: r["ms"])
        print("BEST:", json.dumps(best))
    return 0


if __name__ == "__main__":
    sys.exit(main())
