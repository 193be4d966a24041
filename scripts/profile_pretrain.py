"""Pretrain MFU sweep on the real chip (VERDICT r1, Next #4).

Sweeps batch x chunk x backend for the 12L d512 agent_train_step and
reports tokens/sec + achieved model TFLOP/s + % of v5e bf16 peak.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.data import dataset
from reinforcement_learning_in_music_generation_tpu.models import (
    linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.train import optim
from reinforcement_learning_in_music_generation_tpu.train.pretrain import (
    agent_train_step)

V5E_BF16_PEAK = 197e12
SEQ = int(os.environ.get("SEQ", "512"))


def model_flops_per_token(cfg):
    """fwd+bwd matmul FLOPs per token (3x fwd; attention state terms and
    embeddings/heads included approximately)."""
    d, di, L = cfg.d_model, cfg.d_inner, cfg.n_layer
    e = cfg.d_head
    per_layer = 2 * (4 * d * d + 2 * d * di)          # qkvo + ffn
    attn = 2 * (2 * 2 * e * (e + 1)) * cfg.n_head     # S update + q.S, fwd
    emb = 2 * sum(cfg.emb_sizes) * d
    heads = 2 * d * sum(cfg.vocab_sizes)
    return 3 * (L * (per_layer + attn) + emb + heads)


def main():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    base = C.agent_config(dtype="bfloat16")
    params = lt.init_params(jax.random.PRNGKey(0), base)
    tx = optim.adam(1e-4, grad_clip=3.0)
    fpt = model_flops_per_token(base)
    print(f"model FLOPs/token (fwd+bwd): {fpt/1e6:.1f} M")

    for batch in (32, 64, 128, 256):
        for backend, chunk in (("pallas", 128), ("pallas", 256),
                               ("xla", 128), ("xla", 256)):
            cfg = C.agent_config(dtype="bfloat16", attn_backend=backend,
                                 attn_chunk=chunk)
            try:
                x, y, mask = dataset.synthetic_cp_dataset(
                    batch, SEQ, n_class=cfg.vocab_sizes)
                bx, by = jnp.asarray(x), jnp.asarray(y)
                bm = jnp.asarray(mask, jnp.float32)
                opt_state = tx.init(params)
                key = lambda i: jax.random.key(i, impl="rbg")
                p = params
                p, opt_state, (loss, _) = agent_train_step(
                    p, opt_state, cfg, tx, bx, by, bm, key(1))
                float(loss)
                p, opt_state, (loss, _) = agent_train_step(
                    p, opt_state, cfg, tx, bx, by, bm, key(2))
                float(loss)
                times = []
                for i in range(3):
                    t0 = time.time()
                    p, opt_state, (loss, _) = agent_train_step(
                        p, opt_state, cfg, tx, bx, by, bm, key(i + 3))
                    jax.block_until_ready(loss)
                    times.append(time.time() - t0)
                el = min(times)
                tps = batch * SEQ / el
                tf = tps * fpt
                print(f"B={batch:4d} {backend:6s} chunk={chunk:3d}: "
                      f"{tps/1e3:8.1f}K tok/s  {tf/1e12:6.1f} TFLOP/s "
                      f"({100*tf/V5E_BF16_PEAK:4.1f}% peak)  {el*1e3:7.1f} ms")
            except Exception as ex:
                print(f"B={batch:4d} {backend:6s} chunk={chunk:3d}: "
                      f"FAILED {str(ex)[:120]}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
