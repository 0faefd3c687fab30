"""Shared helper: run a measurement child process, parse its last JSON
line.  Used by perf_report / ab_precision / tune_knobs (the TPU worker
can wedge on big compiles, so every measurement runs in a bounded child
and a failure records an error instead of killing the sweep)."""

import json
import subprocess


def run_child(cmd, timeout_s, env=None):
    try:
        out = subprocess.run(cmd, capture_output=True, timeout=timeout_s,
                             text=True, env=env)
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if lines:
            return json.loads(lines[-1])
        err = (out.stderr.strip().splitlines()[-1][-300:]
               if out.stderr.strip() else "")
        return {"error": f"rc={out.returncode}", "stderr": err}
    except subprocess.TimeoutExpired:
        return {"error": "timeout (tpu wedged?)"}
    except Exception as exc:  # pragma: no cover
        return {"error": repr(exc)[:200]}
