"""Wedge-safe TPU liveness probe.

Exercises the COMPUTE+FETCH path (a wedged tunnel backend still answers
``jax.devices()`` while every real fetch hangs — BENCH.md "Platform
findings", 2026-08-19).  Unlike a bare ``timeout N python -c ...`` the
deadline here is *in-Python* (ADVICE r4 #3): the fetch runs in a daemon
thread, the main thread joins with a deadline plus one grace period, and
only then exits.  This avoids SIGTERM-ing the client mid-fetch — the
exact pathology documented to wedge the tunnel — in the common case
where the fetch is merely slow rather than hung.

Exit codes: 0 = UP (prints "UP"), 3 = no answer within deadline+grace.

Usage: python scripts/tpu_probe.py [deadline_seconds]
"""
import sys
import threading

DEADLINE = float(sys.argv[1]) if len(sys.argv) > 1 else 240.0

result = []


def work():
    import numpy as np  # noqa: delayed imports so a hung backend init is in-thread
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
    x = jnp.ones((128, 128), jnp.bfloat16)
    v = np.asarray((x @ x)[..., :1])
    result.append(float(v[0, 0]))


t = threading.Thread(target=work, daemon=True)
t.start()
t.join(DEADLINE)
if not result:
    # One grace period: a slow-but-healthy backend finishes here instead
    # of being killed mid-fetch.
    t.join(DEADLINE)
if result:
    print("UP", result[0])
    sys.exit(0)
print("DOWN: no compute+fetch answer in %.0fs (+grace)" % DEADLINE, flush=True)
import os

os._exit(3)
