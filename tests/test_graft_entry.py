"""__graft_entry__: the driver's compile-check + multichip dryrun must work."""

import os
import sys

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_traces():
    """entry() must at least trace/lower (full 12L compile is the driver's
    job; tracing catches shape/dtype breakage cheaply)."""
    import __graft_entry__ as g
    fn, args = g.entry()
    jax.jit(fn).lower(*args)
