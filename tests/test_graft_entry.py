"""__graft_entry__: the driver's compile-check + multichip dryrun must work."""

import os
import sys

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions():
    """The driver calls dryrun_multichip in a fresh process whose jax
    backend initializes on the single real chip.  The function must
    detect the shortfall and re-exec itself on a virtual 8-CPU mesh
    (VERDICT r1, Missing #1).  Simulated here with a 1-device parent."""
    import subprocess
    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("_RLMG_DRYRUN_CHILD", None)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "assert jax.device_count() == 1, jax.device_count();"
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout


def test_entry_traces():
    """entry() must at least trace/lower (full 12L compile is the driver's
    job; tracing catches shape/dtype breakage cheaply)."""
    import __graft_entry__ as g
    fn, args = g.entry()
    jax.jit(fn).lower(*args)
