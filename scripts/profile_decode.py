"""On-chip decode breakdown: where does the 0.6 ms/step go?

Variants, each a 64-step lax.scan at batch 32 (12L d512, bf16 weights):
  A. decode_step only (constant token fed back; no heads, no sampling)
  B. full generate step (heads + nucleus sampling), = the primary metric
  C. decode_step with bf16 recurrent state (halved state HBM traffic)
  D. decode_step with fused qkv + fused heads layout (make_decode_params)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.models import (
    common as cm, linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.ops import sampling as smp

BATCH = int(os.environ.get("B", "32"))
STEPS = int(os.environ.get("T", "64"))


def timeit(fn, *args):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))     # sacrificial (axon timing quirk)
    times = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        times.append(time.time() - t0)
    return min(times)


def main():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = C.agent_config()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    pe = cm.sinusoidal_table(cfg.max_len, cfg.d_model, jnp.bfloat16)
    tok0 = jnp.zeros((BATCH, 6), jnp.int32)

    @jax.jit
    def run_A(params):
        state = lt.init_decode_state(cfg, BATCH)

        def body(carry, _):
            h, state = carry
            h, state = lt.decode_step(params, cfg, tok0, state, pe_table=pe)
            return (h, state), h[0, 0]

        (h, _), outs = jax.lax.scan(
            body, (jnp.zeros((BATCH, cfg.d_model), jnp.bfloat16),
                   lt.init_decode_state(cfg, BATCH)), None, length=STEPS)
        return outs

    @jax.jit
    def run_B(params, rng):
        state = lt.init_decode_state(cfg, BATCH)
        settings = tuple(smp.CP_SAMPLING)

        def body(carry, rng_t):
            h, state = carry
            logits = lt.forward_output(params, cfg, h)
            tok = smp.sample_fields(rng_t, logits, settings)
            h, state = lt.decode_step(params, cfg, tok, state, pe_table=pe)
            return (h, state), tok[0, 0]

        rngs = jax.random.split(rng, STEPS)
        (h, _), outs = jax.lax.scan(
            body, (jnp.zeros((BATCH, cfg.d_model), jnp.bfloat16), state), rngs)
        return outs

    @jax.jit
    def run_C(params):
        state = lt.DecodeState(
            s=jnp.zeros((cfg.n_layer, BATCH, cfg.n_head, cfg.d_head,
                         cfg.d_head), jnp.bfloat16),
            z=jnp.zeros((cfg.n_layer, BATCH, cfg.n_head, cfg.d_head),
                        jnp.bfloat16),
            step=jnp.zeros((), jnp.int32))

        def body(carry, _):
            h, state = carry
            h, state = lt.decode_step(params, cfg, tok0, state, pe_table=pe)
            return (h, state), h[0, 0]

        (h, _), outs = jax.lax.scan(
            body, (jnp.zeros((BATCH, cfg.d_model), jnp.bfloat16), state),
            None, length=STEPS)
        return outs

    @jax.jit
    def run_D(params):
        dp = lt.make_decode_params(params, cfg, dtype=jnp.bfloat16)
        state = lt.init_decode_state(cfg, BATCH)

        def body(carry, _):
            h, state = carry
            h, state = lt.decode_step_fused(dp, cfg, tok0, state, pe_table=pe)
            return (h, state), h[0, 0]

        (h, _), outs = jax.lax.scan(
            body, (jnp.zeros((BATCH, cfg.d_model), jnp.bfloat16), state),
            None, length=STEPS)
        return outs

    from reinforcement_learning_in_music_generation_tpu.ops import (
        decode_kernel_v3 as dk3)
    v3p = dk3.make_v3_params(params, cfg, dtype=jnp.bfloat16)

    @jax.jit
    def run_E(params, v3p):
        state = lt.DecodeState(dk3.init_aug_state(cfg, BATCH),
                               jnp.zeros((1,)), jnp.zeros((), jnp.int32))

        def body(carry, _):
            h, state = carry
            h, state = dk3.decode_step_v3(params, v3p, cfg, tok0, state,
                                          pe_table=pe)
            return (h, state), h[0, 0]

        (h, _), outs = jax.lax.scan(
            body, (jnp.zeros((BATCH, cfg.d_model), jnp.bfloat16), state),
            None, length=STEPS)
        return outs

    @jax.jit
    def run_F(params, v3p, rng):
        state = lt.DecodeState(dk3.init_aug_state(cfg, BATCH),
                               jnp.zeros((1,)), jnp.zeros((), jnp.int32))
        settings = tuple(smp.CP_SAMPLING)

        def body(carry, rng_t):
            h, state = carry
            logits = lt.forward_output(params, cfg, h)
            tok = smp.sample_fields(rng_t, logits, settings)
            h, state = dk3.decode_step_v3(params, v3p, cfg, tok, state,
                                          pe_table=pe)
            return (h, state), tok[0, 0]

        rngs = jax.random.split(rng, STEPS)
        (h, _), outs = jax.lax.scan(
            body, (jnp.zeros((BATCH, cfg.d_model), jnp.bfloat16), state), rngs)
        return outs

    for name, fn, args in (
            ("A decode_step only", run_A, (params,)),
            ("B full sample step", run_B, (params, jax.random.PRNGKey(0))),
            ("C bf16 state", run_C, (params,)),
            ("D fused qkv layout", run_D, (params,)),
            ("E v3 kernel only", run_E, (params, v3p)),
            ("F v3 + sampling", run_F, (params, v3p, jax.random.PRNGKey(0)))):
        t = timeit(fn, *args)
        per_step = t / STEPS
        print(f"{name}: {t*1e3:8.2f} ms total, {per_step*1e6:8.1f} us/step, "
              f"{BATCH/per_step:10.0f} tok/s")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
