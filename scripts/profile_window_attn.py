"""Discriminator-forward benchmark (VERDICT r1, Next #8).

Times the three Longformer variants at their reference shapes, plus the
window-attention op in isolation, to decide whether a Pallas local-window
kernel is worth building.  Chained timing (data-dependent steps, one
fetch) per BENCH.md protocol.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.models import longformer as lf
import reinforcement_learning_in_music_generation_tpu.ops.window_attention as wa

K = 8


def chained(f, x):
    jax.block_until_ready(f(x))
    jax.block_until_ready(f(x))
    t0 = time.time()
    for _ in range(K):
        x2 = f(x)
        x = x2 if x2.shape == x.shape else x
    jax.block_until_ready(x2)
    float(jnp.sum(x2.astype(jnp.float32)).block_until_ready()
          if hasattr(x2, "block_until_ready") else 0.0)
    return (time.time() - t0) / K


def bench_model(name, cfg, b, s):
    params = lf.init_params(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(1)
    x = jax.random.randint(rng, (b, s, cfg.n_fields), 0, 3).astype(jnp.int32)
    mask = jnp.ones((b, s), jnp.float32)

    @jax.jit
    def fwd(c):
        h = lf.forward(params, cfg, x, mask, deterministic=True)
        return jnp.sum(h.astype(jnp.float32)) + c

    @jax.jit
    def fwdbwd(c):
        def loss(p):
            h = lf.forward(p, cfg, x, mask, deterministic=True)
            return jnp.mean(jnp.square(h.astype(jnp.float32)))
        l, g = jax.value_and_grad(loss)(params)
        # consume a grad leaf so the backward pass isn't dead code
        return l + c + jnp.sum(g['proj']['w'].astype(jnp.float32)) * 1e-12

    c = jnp.zeros(())
    for label, f in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
        float(f(c)); float(f(c))
        t0 = time.time()
        out = c
        for _ in range(K):
            out = f(out)
        float(out)
        el = (time.time() - t0) / K
        tok_s = b * s / el
        print(f"{name} {label}: {el*1e3:8.2f} ms  ({tok_s/1e3:8.1f}K tok/s)")
        sys.stdout.flush()


def bench_op(name, b, h, s, d, window):
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d), jnp.bfloat16)
    mask = jnp.ones((b, s), jnp.float32)

    @jax.jit
    def op(c):
        o = wa.window_attention(q + c, q, q, mask, window=window)
        return jnp.sum(o.astype(jnp.float32)) * 1e-9

    c = jnp.zeros((), jnp.bfloat16)
    float(op(c)); float(op(c))
    t0 = time.time()
    out = c
    for _ in range(K):
        out = op(out).astype(jnp.bfloat16)
    float(out)
    el = (time.time() - t0) / K
    # useful FLOPs in the band: 2 matmuls over ~S*(window+1) scores
    flops = 2 * 2 * b * h * s * min(s, window + 1) * d
    print(f"{name} op: {el*1e3:8.2f} ms  band-FLOPs {flops/1e9:.2f} G "
          f"-> {flops/el/1e12:.2f} TFLOP/s effective")
    sys.stdout.flush()


def main():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # AIRL discriminator: 10L window 50, batch 100 x S=50 (AIRL.py shapes)
    bench_model("AIRL disc (B=100,S=50,w=50)",
                C.airl_discriminator_config(), 100, 50)
    # PPO reward: 12L window 512, B=30 x S=50 (rollout re-scoring shape)
    bench_model("PPO reward (B=30,S=50,w=512)",
                C.ppo_reward_config(), 30, 50)
    # discrim-pretrain LM: 12L window 512 at S=3584 (blocked path)
    bench_model("discrim LM (B=4,S=3584,w=512)",
                C.discrim_lm_config(), 4, 3584)

    bench_op("dense  (B=100,H=8,S=50,w=50)", 100, 8, 50, 64, 50)
    bench_op("dense  (B=4,H=8,S=1024,w=512)", 4, 8, 1024, 64, 512)
    bench_op("blocked(B=4,H=8,S=3584,w=512)", 4, 8, 3584, 64, 512)


if __name__ == "__main__":
    main()
