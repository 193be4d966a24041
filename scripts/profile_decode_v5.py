"""v5 persistent decode kernel: greedy parity vs the XLA path + perf sweep.

Usage:  python scripts/profile_decode_v5.py [parity|perf]
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
from reinforcement_learning_in_music_generation_tpu.ops import sampling as smp
from reinforcement_learning_in_music_generation_tpu.ops.experimental import (
    decode_kernel_v5 as dk5)


def setup():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make(cfg, batch, dtype=jnp.bfloat16):
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
    v5p = dk5.make_v5_params(params, cfg, dtype=dtype)
    tok0 = jnp.tile(jnp.asarray(sampler.CP_SEED, jnp.int32)[None], (batch, 1))
    st = lt.init_decode_state(cfg, batch)
    s5, z5 = dk5.pack_state(st.s.astype(jnp.float32), st.z.astype(jnp.float32))
    return params, v5p, tok0, s5, z5


def run_v5(params, v5p, cfg, tok0, s5, z5, T, bb, greedy, seed=0):
    settings = smp.GREEDY if greedy else smp.CP_SAMPLING
    temps = tuple(s.temperature for s in settings)
    topps = tuple(s.top_p if s.top_p is not None else float("inf")
                  for s in settings)
    fn = _jitted(v5p, cfg, T, bb, greedy, temps, topps)
    return fn(tok0, s5, z5, jnp.asarray(seed, jnp.int32))


_CACHE = {}


def _jitted(v5p, cfg, T, bb, greedy, temps, topps):
    key = (id(v5p), T, bb, greedy, temps, topps)
    if key not in _CACHE:
        pe = cm.sinusoidal_table(cfg.max_len, cfg.d_model, jnp.float32)[:T]
        _CACHE[key] = jax.jit(lambda tok0, s5, z5, seed: dk5.fused_decode_v5(
            v5p, tok0, s5, z5, pe, seed, n_head=cfg.n_head, max_tokens=T,
            bb=bb, vocab_sizes=cfg.vocab_sizes, temps=temps, topps=topps,
            greedy=greedy, eps=cfg.attn_eps))
    return _CACHE[key]


def parity(batch=8, T=64):
    cfg = C.agent_config()
    params, v5p, tok0, s5, z5 = make(cfg, batch)
    toks, s_out, z_out = run_v5(params, v5p, cfg, tok0, s5, z5, T,
                                bb=batch, greedy=True)
    toks = np.asarray(toks).transpose(1, 0, 2)       # (B, T, nf)

    init = tok0[:, None, :]
    ref = sampler.generate_tokens(params, cfg, jax.random.PRNGKey(0), init,
                                  max_tokens=T, greedy=True,
                                  settings=tuple(smp.GREEDY),
                                  fused=False, fused_sampling=True)
    ref_toks = np.asarray(ref.tokens)[:, 1:]         # drop seed
    n = toks.size
    mism = int((toks != ref_toks).sum())
    print(f"greedy parity: {n - mism}/{n} tokens match "
          f"({mism} mismatches)")
    first = np.argwhere(toks != ref_toks)
    if len(first):
        b0, t0, f0 = first[0]
        print("first mismatch at", first[0], "v5:", toks[b0, t0],
              "ref:", ref_toks[b0, t0])
    # stochastic smoke: valid ranges
    stoks, _, _ = run_v5(params, v5p, cfg, tok0, s5, z5, T,
                         bb=batch, greedy=False, seed=7)
    stoks = np.asarray(stoks)
    for f, v in enumerate(cfg.vocab_sizes):
        assert stoks[..., f].min() >= 0 and stoks[..., f].max() < v, f
    print("stochastic decode: all fields in vocab range")
    return mism


def perf(batch=256, T=128):
    cfg = C.agent_config()
    params, v5p, tok0, s5, z5 = make(cfg, batch)
    for bb in (8, 16, 32):
        if batch % bb:
            continue
        try:
            out = run_v5(params, v5p, cfg, tok0, s5, z5, T, bb=bb,
                         greedy=False)
            np.asarray(out[0])
            out = run_v5(params, v5p, cfg, tok0, s5, z5, T, bb=bb,
                         greedy=False, seed=1)
            np.asarray(out[0])
            ts = []
            for i in range(3):
                t0 = time.time()
                out = run_v5(params, v5p, cfg, tok0, s5, z5, T, bb=bb,
                             greedy=False, seed=2 + i)
                jax.block_until_ready(out[0])
                ts.append(time.time() - t0)
            el = min(ts)
            print(f"bb={bb}: {el:.4f}s  {batch * T / el:,.0f} tok/s  "
                  f"{el / T * 1e6:.0f} us/step")
        except Exception as e:
            print(f"bb={bb}: FAILED {str(e)[:200]}")
        sys.stdout.flush()


if __name__ == "__main__":
    setup()
    mode = sys.argv[1] if len(sys.argv) > 1 else "parity"
    if mode == "parity":
        parity()
    else:
        perf()
