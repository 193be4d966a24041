"""v6 transposed-network decode kernel: greedy parity vs the XLA path +
perf sweep.

Usage:  python scripts/profile_decode_v6.py [parity|perf [B]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.generate import sampler
from reinforcement_learning_in_music_generation_tpu.models import (
    common as cm, linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.ops import (
    decode_kernel_v6 as dk6, sampling as smp)


def setup():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make(cfg, batch, dtype=jnp.bfloat16, state_dtype=jnp.float32):
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    pe = cm.sinusoidal_table(cfg.max_len, cfg.d_model, jnp.float32)
    v6p = dk6.make_v6_params(params, cfg, pe, dtype=dtype)
    tok0T = jnp.tile(jnp.asarray(sampler.CP_SEED, jnp.int32)[:, None],
                     (1, batch))
    st = lt.init_decode_state(cfg, batch)
    s6, z6 = dk6.pack_state_v6(st.s.astype(state_dtype),
                               st.z.astype(state_dtype))
    return params, v6p, tok0T, s6, z6


_CACHE = {}


def run_v6(v6p, cfg, tok0T, s6, z6, T, greedy, seed=0, t0=0):
    settings = smp.GREEDY if greedy else smp.CP_SAMPLING
    temps = tuple(s.temperature for s in settings)
    topps = tuple(s.top_p if s.top_p is not None else float("inf")
                  for s in settings)
    key = (id(v6p), T, greedy, temps, topps, s6.dtype)
    if key not in _CACHE:
        _CACHE[key] = jax.jit(
            lambda tok0T, s6, z6, seed: dk6.fused_decode_v6(
                v6p, tok0T, s6, z6, t0, seed, n_head=cfg.n_head,
                max_tokens=T, vocab_sizes=cfg.vocab_sizes, temps=temps,
                topps=topps, greedy=greedy, eps=cfg.attn_eps))
    return _CACHE[key](tok0T, s6, z6, jnp.asarray(seed, jnp.int32))


def parity(batch=128, T=64):
    cfg = C.agent_config()
    params, v6p, tok0T, s6, z6 = make(cfg, batch)
    toksT, s_out, z_out = run_v6(v6p, cfg, tok0T, s6, z6, T, greedy=True)
    toks = np.asarray(toksT).transpose(2, 0, 1)      # (B, T, nf)

    init = tok0T.T[:, None, :]
    ref = sampler.generate_tokens(params, cfg, jax.random.PRNGKey(0), init,
                                  max_tokens=T, greedy=True,
                                  settings=tuple(smp.GREEDY),
                                  fused=False, fused_sampling=True)
    ref_toks = np.asarray(ref.tokens)[:, 1:]
    n = toks.size
    mism = int((toks != ref_toks).sum())
    print(f"greedy parity: {n - mism}/{n} tokens match ({mism} mismatches)")
    bad = np.argwhere(toks != ref_toks)
    if len(bad):
        b0, t0_, f0 = bad[0]
        print("first mismatch at", bad[0], "v6:", toks[b0, t0_],
              "ref:", ref_toks[b0, t0_])
    stoksT, _, _ = run_v6(v6p, cfg, tok0T, s6, z6, T, greedy=False, seed=7)
    stoks = np.asarray(stoksT)
    for f, v in enumerate(cfg.vocab_sizes):
        assert stoks[:, f, :].min() >= 0 and stoks[:, f, :].max() < v, f
    print("stochastic decode: all fields in vocab range")
    return mism


def perf(batch=512, T=128, state_dtype=jnp.float32):
    cfg = C.agent_config()
    params, v6p, tok0T, s6, z6 = make(cfg, batch, state_dtype=state_dtype)
    out = run_v6(v6p, cfg, tok0T, s6, z6, T, greedy=False, seed=0)
    jax.block_until_ready(out[0])
    ts = []
    for i in range(3):
        t0 = time.time()
        out = run_v6(v6p, cfg, tok0T, s6, z6, T, greedy=False, seed=2 + i)
        jax.block_until_ready(out[0])
        ts.append(time.time() - t0)
    el = min(ts)
    print(f"B={batch} state={jnp.dtype(state_dtype).name}: "
          f"{el/T*1e6:.0f} us/step  {batch*T/el:,.0f} tok/s")


if __name__ == "__main__":
    setup()
    mode = sys.argv[1] if len(sys.argv) > 1 else "parity"
    if mode == "parity":
        parity()
    else:
        b = int(sys.argv[2]) if len(sys.argv) > 2 else 512
        perf(batch=b)
