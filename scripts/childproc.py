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


def _informative_line(stderr: str) -> str:
    """Last stderr line that looks like an actual error — JAX's traceback-
    filtering banner is often the literal last line and carries nothing."""
    lines = [ln for ln in stderr.splitlines() if ln.strip()]
    if not lines:
        return ""
    pat = ("Error", "error:", "Scoped allocation", "RESOURCE_EXHAUSTED",
           "INTERNAL", "exceeded", "Mosaic", "failed", "assert")
    for ln in reversed(lines):
        if any(p in ln for p in pat):
            return ln[-300:]
    return lines[-1][-300:]


def run_child_lines(cmd, timeout_s, env=None):
    """Stream a child's stdout, parsing every JSON line as it lands.

    Returns (records, error): records holds each parsed line even when
    the child is later killed by the timeout or crashes mid-group —
    bench.py's grouped case children rely on this so a driver-budget
    kill loses only the in-flight case.  error is None on rc==0."""
    import time as _time
    records, err = [], None
    try:
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True,
                                env=env)
    except Exception as exc:
        return records, repr(exc)[:200]
    deadline = _time.time() + timeout_s

    def _reap():
        proc.kill()
        try:
            proc.wait(timeout=10)
        except Exception:
            pass

    import threading
    killer = threading.Timer(max(timeout_s, 1), _reap)
    killer.daemon = True
    killer.start()
    try:
        for line in proc.stdout:
            if line.startswith("{"):
                try:
                    records.append(json.loads(line))
                except ValueError:
                    pass
        proc.wait(timeout=max(deadline - _time.time(), 1))
    except Exception:
        err = "timeout (tpu wedged?)"
        _reap()
    finally:
        killer.cancel()
    if err is None and _time.time() >= deadline:
        err = "timeout (tpu wedged?)"
    elif err is None and proc.returncode not in (0, None):
        err = f"rc={proc.returncode}"
    return records, err


def run_child(cmd, timeout_s, env=None):
    try:
        out = subprocess.run(cmd, capture_output=True, timeout=timeout_s,
                             text=True, env=env)
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if lines:
            return json.loads(lines[-1])
        # keep the FULL stderr on disk — the one-line summary has lost
        # real tracebacks before (r3i an_full: only the JAX filtering
        # banner survived)
        tag = "".join(c if c.isalnum() else "_" for c in str(cmd[-1]))[-40:]
        path = f"/tmp/child_stderr_{tag}.log"
        try:
            with open(path, "w") as f:
                f.write(out.stderr)
        except OSError:
            path = ""
        return {"error": f"rc={out.returncode}",
                "stderr": _informative_line(out.stderr),
                "stderr_file": path}
    except subprocess.TimeoutExpired:
        return {"error": "timeout (tpu wedged?)"}
    except Exception as exc:  # pragma: no cover
        return {"error": repr(exc)[:200]}


if __name__ == "__main__":
    # `python scripts/childproc.py --probe` -> exit 0 iff TPU alive
    if "--probe" in sys.argv:
        sys.exit(0 if probe_alive() else 1)
