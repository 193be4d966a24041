"""Benchmark: generated tokens/sec/chip on the flagship model.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric = autoregressive decode throughput of the 12-layer d=512 CP
LinearTransformer (the testing-no-type-cp.py configuration), batched decode
with on-device per-field nucleus sampling.  vs_baseline compares against
the PyTorch-CPU reference decode path (bench_baseline_torch.py, cached).
Also measures pretrain tokens/sec (agent_pretrain.py configuration) and
reports it in the auxiliary fields.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = int(os.environ.get("RLMG_BENCH_BATCH", "32"))
STEPS = int(os.environ.get("RLMG_BENCH_STEPS", "256"))
PRETRAIN_BATCH = int(os.environ.get("RLMG_BENCH_PRETRAIN_BATCH", "32"))
PRETRAIN_SEQ = int(os.environ.get("RLMG_BENCH_PRETRAIN_SEQ", "512"))


def bench_decode():
    import jax
    import jax.numpy as jnp
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.generate import sampler
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)

    cfg = C.agent_config()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    dtype = os.environ.get("RLMG_BENCH_DTYPE", "bfloat16")
    if dtype == "bfloat16":
        # decode is weight-bandwidth bound; bf16 weights halve HBM traffic
        # (recurrent attention state stays f32 inside decode_step)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params)
    init = jnp.tile(jnp.asarray(sampler.CP_SEED, jnp.int32)[None, None, :],
                    (BATCH, 1, 1))

    def run(seed):
        return sampler.generate_tokens(
            params, cfg, jax.random.PRNGKey(seed), init,
            max_tokens=STEPS, bar_cond=None)

    import numpy as np
    # Tunneled-platform timing protocol: the first post-warmup
    # block_until_ready no-ops, so do one sacrificial run with a host fetch;
    # subsequent blocks behave and avoid paying ~45ms D2H latency per run.
    res = run(0)
    np.asarray(res.tokens)          # compile + warmup
    res = run(1)
    np.asarray(res.tokens)          # sacrificial fetch
    times = []
    for i in range(2, 5):
        t0 = time.time()
        res = run(i)
        jax.block_until_ready(res.tokens)
        times.append(time.time() - t0)
    elapsed = min(times)
    return BATCH * STEPS / elapsed, elapsed


def bench_pretrain():
    import jax
    import jax.numpy as jnp
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.data import dataset
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)
    from reinforcement_learning_in_music_generation_tpu.train import (
        agent_train_step, optim)

    cfg = C.agent_config(
        dtype=os.environ.get("RLMG_BENCH_TRAIN_DTYPE", "bfloat16"))
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.adam(1e-4, grad_clip=3.0)
    opt_state = tx.init(params)
    x, y, mask = dataset.synthetic_cp_dataset(PRETRAIN_BATCH, PRETRAIN_SEQ,
                                              n_class=cfg.vocab_sizes)
    bx, by = jnp.asarray(x), jnp.asarray(y)
    bm = jnp.asarray(mask, jnp.float32)

    import numpy as np
    key = lambda i: jax.random.key(i, impl="rbg")   # ~11% over threefry
    params, opt_state, (loss, _) = agent_train_step(
        params, opt_state, cfg, tx, bx, by, bm, key(1))
    float(loss)                     # compile + warmup
    params, opt_state, (loss, _) = agent_train_step(
        params, opt_state, cfg, tx, bx, by, bm, key(2))
    float(loss)                     # sacrificial fetch (see bench_decode)
    times = []
    for i in range(4):
        t0 = time.time()
        params, opt_state, (loss, _) = agent_train_step(
            params, opt_state, cfg, tx, bx, by, bm, key(i))
        jax.block_until_ready(loss)
        times.append(time.time() - t0)
    elapsed = min(times)
    return PRETRAIN_BATCH * PRETRAIN_SEQ / elapsed, elapsed


def main():
    decode_tps, decode_s = bench_decode()
    pretrain_tps, pretrain_s = bench_pretrain()
    try:
        from bench_baseline_torch import get_baseline
        baseline = get_baseline()
    except Exception:
        baseline = None
    vs = (decode_tps / baseline) if baseline else None
    print(json.dumps({
        "metric": "generated tokens/sec/chip",
        "value": round(decode_tps, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "decode_batch": BATCH,
        "decode_steps": STEPS,
        "decode_step_time_s": round(decode_s, 4),
        "pretrain_tokens_per_sec": round(pretrain_tps, 1),
        "pretrain_step_time_s": round(pretrain_s, 4),
        "baseline_torch_cpu_tokens_per_sec": (
            round(baseline, 2) if baseline else None),
    }))


if __name__ == "__main__":
    main()
