"""Shared helper: run a measurement child process, parse its last JSON
line.  Used by perf_report / ab_precision / tune_knobs (the TPU worker
can wedge on big compiles, so every measurement runs in a bounded child
and a failure records an error instead of killing the sweep)."""

import json
import subprocess
import sys


def probe_alive(timeout_s: float = 120, env=None) -> bool:
    """True iff the TPU worker answers a tiny computation in time.
    The one shared liveness probe (bench.py pre-gate, r2_measure.sh)."""
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax, numpy as np, jax.numpy as jnp;"
             "assert jax.devices()[0].platform == 'tpu';"
             "print(float(np.asarray(jnp.sum(jnp.ones((128,128))))))"],
            capture_output=True, timeout=timeout_s, text=True, env=env)
        return out.returncode == 0
    except Exception:
        return False


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


if __name__ == "__main__":
    # `python scripts/childproc.py --probe` -> exit 0 iff TPU alive
    if "--probe" in sys.argv:
        sys.exit(0 if probe_alive() else 1)
