"""Fused qkv+attention kernel (ops/attention_block.py): on-chip A/B.

Two measurements, one subprocess per configuration (env vars are read at
trace time; separate processes keep the jit caches honest):

  1. full train step via bench_pretrain's exact protocol (B=32 x S=512,
     bf16, scan_unroll=12, fused tail on both sides) with
     RLMG_ATTN_BACKEND in {xla (default composition), pallas-qkv};
  2. op-level fwd+bwd of just the attention region (qkv matmuls +
     chunked recurrence) at the same shape, kernel vs XLA, chunk sweep.

Usage: python scripts/profile_attention_block.py             # A/B both
       python scripts/profile_attention_block.py one <mode>  # internal
       python scripts/profile_attention_block.py op [chunk]  # op-level
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

B, S, H, E = 32, 512, 8, 64
D = H * E


def run_step(mode: str):
    if mode != "xla":
        os.environ["RLMG_ATTN_BACKEND"] = mode
    import bench
    bench._setup_cache()
    tps, el = bench.bench_pretrain()
    print(json.dumps({"mode": mode, "tok_s": round(tps, 1),
                      "step_s": round(el, 4)}))


def run_op(chunk: int):
    import jax
    import jax.numpy as jnp
    import bench
    bench._setup_cache()
    from reinforcement_learning_in_music_generation_tpu.ops import (
        attention_block as ab)
    from reinforcement_learning_in_music_generation_tpu.ops.linear_attention import (
        causal_linear_attention_bshe)

    dt = jnp.bfloat16
    h = jax.random.normal(jax.random.PRNGKey(0), (B * S, D), dt)
    w = jax.random.normal(jax.random.PRNGKey(1), (D, 3 * D), dt) * 0.05
    bb = jax.random.normal(jax.random.PRNGKey(2), (3 * D,), dt) * 0.05

    def loss_kernel(h, w, bb):
        o = ab.qkv_attention_block(h, w, bb, B, H, chunk=chunk)
        return jnp.sum(o.astype(jnp.float32))

    def loss_xla(h, w, bb):
        qkv = h @ w + bb
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shp = lambda x: x.reshape(B, S, H, E)
        o = causal_linear_attention_bshe(shp(q), shp(k), shp(v), chunk=chunk)
        return jnp.sum(o.astype(jnp.float32))

    out = {"chunk": chunk}
    for name, fn in (("kernel", loss_kernel), ("xla", loss_xla)):
        g = jax.jit(jax.grad(fn, argnums=(0, 1, 2)))
        r = g(h, w, bb)
        jax.block_until_ready(r)
        float(jnp.sum(r[0].astype(jnp.float32)))     # priming fetch
        K = 20
        t0 = time.time()
        hh = h
        for i in range(K):
            r = g(hh, w, bb)
            hh = h + 0.0 * r[0].astype(dt)           # chain data deps
        float(jnp.sum(r[0].astype(jnp.float32)))
        out[name + "_fwdbwd_ms"] = round((time.time() - t0) / K * 1e3, 3)
    print(json.dumps(out))


def run_optrace(chunk: int):
    """Device trace of the op-level kernel grad — run when the op-level
    and in-step numbers disagree (first r4 queue pass: 47 ms op-level vs
    ~0.8 ms/layer implied in-step) to see which op actually eats the
    time; fwd-only is traced alongside for the same shapes."""
    import jax
    import jax.numpy as jnp
    import bench
    bench._setup_cache()
    from reinforcement_learning_in_music_generation_tpu.ops import (
        attention_block as ab)
    from reinforcement_learning_in_music_generation_tpu.utils import metrics

    dt = jnp.bfloat16
    h = jax.random.normal(jax.random.PRNGKey(0), (B * S, D), dt)
    w = jax.random.normal(jax.random.PRNGKey(1), (D, 3 * D), dt) * 0.05
    bb = jax.random.normal(jax.random.PRNGKey(2), (3 * D,), dt) * 0.05

    def loss_kernel(h, w, bb):
        o = ab.qkv_attention_block(h, w, bb, B, H, chunk=chunk)
        return jnp.sum(o.astype(jnp.float32))

    for tag, fn in (("fwd", jax.jit(loss_kernel)),
                    ("fwdbwd", jax.jit(jax.grad(loss_kernel,
                                                argnums=(0, 1, 2))))):
        r = fn(h, w, bb)
        jax.block_until_ready(r)
        steps = 5
        log_dir = f"/tmp/rlmg_trace_attnop_{tag}"
        with metrics.profile_trace(log_dir):
            for _ in range(steps):
                r = fn(h, w, bb)
            jax.block_until_ready(r)
        rows = metrics.summarize_trace(log_dir, top=12, steps=steps)
        total = sum(us for _, us, _ in rows)
        print(f"--- op-level {tag} (chunk={chunk}) ---")
        for kind, us, cnt in rows[:12]:
            print(f"{us:10.0f} us/step  {cnt:7.1f} ops  {kind}")
        print(f"{total:10.0f} us/step TOTAL")


def main():
    for mode in ("xla", "pallas-qkv"):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one", mode],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=3600)
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
        if not line:
            print(f"{mode} FAILED:\n{p.stdout[-2000:]}\n{p.stderr[-4000:]}")
            continue
        r = json.loads(line[-1])
        print(f"{mode}: {r['tok_s']:,.0f} tok/s ({r['step_s']*1e3:.1f} ms/step)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_step(sys.argv[2])
    elif len(sys.argv) > 1 and sys.argv[1] == "op":
        run_op(int(sys.argv[2]) if len(sys.argv) > 2 else 128)
    elif len(sys.argv) > 1 and sys.argv[1] == "optrace":
        run_optrace(int(sys.argv[2]) if len(sys.argv) > 2 else 128)
    else:
        main()
