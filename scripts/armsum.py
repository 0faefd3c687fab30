"""Summarize arm-tagged bench logs: one line per (tag, case).

Usage: python scripts/armsum.py /tmp/r5b_exit.log [more logs...]
Reads every JSON line, groups by the first non-standard tag key
(arm/knob/exit_every/group/defer/gsort/...), prints ms_per_frame with
the dispatch-tax-adjusted value (tax = 26/frames ms)."""

import json
import sys

STD = {"metric", "value", "unit", "vs_baseline", "ms_per_frame", "fps",
       "total_mrays_per_s", "frames", "checksum", "case", "mrays",
       "ordered_primary", "presets", "close_far", "error", "note",
       "stderr", "stderr_file"}


def main(paths):
    rows = []
    for path in paths:
        try:
            lines = open(path).read().splitlines()
        except OSError as exc:
            print(f"{path}: {exc}")
            continue
        for ln in lines:
            if not ln.startswith("{"):
                continue
            try:
                d = json.loads(ln)
            except ValueError:
                continue
            if "presets" in d:          # cumulative record line
                continue
            tags = {k: d[k] for k in d if k not in STD}
            tag = ",".join(f"{k}={v}" for k, v in sorted(tags.items()))
            if "error" in d:
                rows.append((tag, d.get("case", "?"), None, None,
                             d["error"][:60]))
            elif "ms_per_frame" in d:
                f = d.get("frames", 32)
                ms = d["ms_per_frame"]
                rows.append((tag, d.get("case", "?"), ms,
                             round(ms - 26.0 / f, 2), ""))
    w = max((len(r[0]) for r in rows), default=4) + 1
    for tag, case, ms, true, err in rows:
        if ms is None:
            print(f"{tag:<{w}} {case:<12} ERROR {err}")
        else:
            print(f"{tag:<{w}} {case:<12} {ms:8.2f}  true {true:8.2f}")


if __name__ == "__main__":
    main(sys.argv[1:])
