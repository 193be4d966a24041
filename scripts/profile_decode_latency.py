"""Small-batch / latency-mode decode measurement (VERDICT r2 #1).

The headline decode number is large-batch throughput (B=1024), but the
reference's actual scenario is 5 songs generated one at a time at 50 bars
(dqn_policy/testing-no-type-cp.py:182-224).  The v6 persistent kernel pads
every batch to a 128-lane tile, so at B=1 it burns 127/128 lanes — whether
it still beats the XLA scan path at small batch is an empirical question
(the v6 step may be faster than a 12-layer XLA while_loop iteration even
with the waste).  This script measures:

  * tokens/sec and us/step at B in {1, 8, 32, 128} for
      - v6 persistent path (pads to 128 lanes)
      - scan path + v4 per-step fused kernel
      - scan path pure XLA
  * the "5 songs x 50 bars" wall-clock (stochastic sampling, the
    reference's testing-no-type-cp scenario) per path, both batched B=5
    and one-at-a-time B=1 x 5 (the reference's exact serial shape)

Usage: python scripts/profile_decode_latency.py [rate|songs|chunks|all]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.generate import sampler
from reinforcement_learning_in_music_generation_tpu.models import (
    linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.ops import sampling as smp


def setup():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_params():
    cfg = C.agent_config()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    return cfg, params


def _fetch(r):
    np.asarray(r.tokens[..., :1])       # real host fetch (tunnel ~10-40 ms)


def _time(fn, n=3, reps=1):
    """`block_until_ready` NO-OPs on this platform (the bench.py
    methodology note; the first r4 queue pass printed 2 us/step for the
    v4 B=1 path that r3 measured at 284 us/step).  Every timed window is
    therefore closed by ONE real host fetch of the last result; `reps`
    back-to-back calls amortize the tunnel fetch across the window.

    Each rep's seed folds a zeroed token from the previous rep's output
    (ADVICE r4 #2): the closing fetch then transitively forces every rep
    — a lazy execution model cannot elide reps 0..reps-2."""
    _fetch(fn(0))
    _fetch(fn(1))               # sacrificial (compile, memory steady-state)
    ts = []
    for i in range(2, 2 + n):
        t0 = time.time()
        r = fn(i * 1000)
        for k in range(1, reps):
            dep = (r.tokens.reshape(-1)[0] & 0).astype(jnp.int32)
            r = fn(i * 1000 + k + dep)
        _fetch(r)
        ts.append((time.time() - t0) / reps)
    return min(ts)


def run_path(path, params, cfg, init, T, seed, bar_cond=None, chunk=128):
    kw = dict(max_tokens=T, bar_cond=bar_cond,
              settings=tuple(smp.CP_SAMPLING))
    if path == "v6":
        r = sampler.generate_tokens_persistent(
            params, cfg, jax.random.PRNGKey(seed), init, chunk=chunk, **kw)
    elif path in ("v7", "v8"):
        os.environ["RLMG_LATENCY_KERNEL"] = path
        r = sampler.generate_tokens_latency(
            params, cfg, jax.random.PRNGKey(seed), init, chunk=chunk, **kw)
    elif path == "v4":
        r = sampler.generate_tokens(params, cfg, jax.random.PRNGKey(seed),
                                    init, fused=True, fused_sampling=True,
                                    **kw)
    else:
        r = sampler.generate_tokens(params, cfg, jax.random.PRNGKey(seed),
                                    init, fused=False, fused_sampling=True,
                                    **kw)
    jax.block_until_ready(r.tokens)
    return r


def rate(T=256):
    cfg, params = make_params()
    out = {}
    for b in (1, 8, 32, 128):
        init = jnp.tile(jnp.asarray(sampler.CP_SEED, jnp.int32)[None, None],
                        (b, 1, 1))
        # v7 keeps ALL weights + state VMEM-resident, so it only exists
        # for B small enough to fit (B<=16 at the flagship size).
        paths = (("v8", "v7", "v6", "v4", "xla") if b <= 16
                 else ("v6", "v4", "xla"))
        for path in paths:
            el = _time(lambda s: run_path(path, params, cfg, init, T, s),
                       reps=6)
            out[f"{path}_b{b}"] = dict(us_step=round(el / T * 1e6, 1),
                                       tok_s=round(b * T / el, 1))
            print(f"B={b:4d} {path:3s}: {el/T*1e6:8.0f} us/step "
                  f"{b*T/el:12,.0f} tok/s", flush=True)
    return out


def songs(n_songs=5, bars=50, max_tokens=4096):
    """The reference scenario: 5 songs, 50 bars each."""
    cfg, params = make_params()
    out = {}
    for path in ("v8", "v7", "v6", "v4", "xla"):
        # batched: all 5 songs in one call
        init = jnp.tile(jnp.asarray(sampler.CP_SEED, jnp.int32)[None, None],
                        (n_songs, 1, 1))
        el = _time(lambda s: run_path(path, params, cfg, init, max_tokens, s,
                                      bar_cond=bars), n=2)
        r = run_path(path, params, cfg, init, max_tokens, 99, bar_cond=bars)
        ntok = int(np.asarray(r.valid).sum())
        out[f"{path}_batched_s"] = round(el, 3)
        out[f"{path}_batched_tok_s"] = round(ntok / el, 1)
        print(f"5x{bars}bars {path:3s} batched(B=5): {el:7.2f}s "
              f"({ntok} tokens, {ntok/el:,.0f} tok/s)", flush=True)
        # serial: one at a time (the reference's exact loop shape)
        init1 = init[:1]
        el1 = _time(lambda s: run_path(path, params, cfg, init1, max_tokens,
                                       s, bar_cond=bars), n=2)
        out[f"{path}_serial_s"] = round(el1 * n_songs, 3)
        print(f"5x{bars}bars {path:3s} serial (B=1): {el1*n_songs:7.2f}s "
              f"({el1:.2f}s/song)", flush=True)
    return out


def prompt(T0=512, gen=16, reps=10):
    """Prompt-ingestion A/B: parallel prefill (forward_prefill) vs the
    sequential decode_step scan, at B in {1, 8}.  The env knob is read at
    trace time, so the two legs clear the jit cache between runs (the
    persistent compile cache still serves both).

    Timing protocol: `block_until_ready` can NO-OP on this platform (the
    bench.py methodology note — the first queue log of this leg printed
    0.3 ms for a 512-sequential-step scan), so the timed window runs
    `reps` back-to-back calls and closes with one real host fetch; the
    ~10-40 ms tunnel fetch is amortized across reps."""
    cfg, params = make_params()
    rows = jnp.tile(jnp.asarray(sampler.CP_SEED, jnp.int32)[None, None],
                    (8, T0, 1))
    out = {}
    for b in (1, 8):
        init = rows[:b]
        for mode_name, env in (("prefill", None), ("scan", "0")):
            if env is None:
                os.environ.pop("RLMG_PREFILL", None)
            else:
                os.environ["RLMG_PREFILL"] = env
            jax.clear_caches()
            r = run_path("xla", params, cfg, init, gen, 0)
            np.asarray(r.tokens[..., :1])          # sacrificial host fetch
            t0 = time.time()
            r = run_path("xla", params, cfg, init, gen, 1)
            for i in range(1, reps):
                # seed depends on the previous rep's output so the closing
                # fetch forces every rep (ADVICE r4 #2)
                dep = (r.tokens.reshape(-1)[0] & 0).astype(jnp.int32)
                r = run_path("xla", params, cfg, init, gen, i + 1 + dep)
            np.asarray(r.tokens[..., :1])          # one real fetch
            el = (time.time() - t0) / reps
            out[f"{mode_name}_b{b}_s"] = round(el, 4)
            print(f"prompt T0={T0} B={b} {mode_name}: {el:7.3f}s "
                  f"(incl. {gen} sampled steps, {reps} reps)", flush=True)
    os.environ.pop("RLMG_PREFILL", None)
    return out


def chunks(B=1024, T=256):
    """Inter-chunk dispatch cost on the v6 path: chunk=128 vs 256."""
    cfg, params = make_params()
    init = jnp.tile(jnp.asarray(sampler.CP_SEED, jnp.int32)[None, None],
                    (B, 1, 1))
    out = {}
    for ch in (64, 128, 256):
        el = _time(lambda s: run_path("v6", params, cfg, init, T, s,
                                      chunk=ch))
        out[f"chunk{ch}_tok_s"] = round(B * T / el, 1)
        print(f"B={B} chunk={ch}: {B*T/el:12,.0f} tok/s", flush=True)
    return out


if __name__ == "__main__":
    setup()
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    res = {}
    if mode in ("rate", "all"):
        res["rate"] = rate()
    if mode in ("songs", "all"):
        res["songs"] = songs()
    if mode in ("prompt", "all"):
        res["prompt"] = prompt()
    if mode in ("chunks", "all"):
        res["chunks"] = chunks()
    print(json.dumps(res))
