"""Capture + summarize a device trace of the pretrain step.

Usage: RLMG_FFN_BACKEND=pallas-tail python scripts/trace_pretrain.py [steps]

Prints the summarize_trace device-time breakdown (op kind, us/step) for
K timed steps of bench_pretrain's exact protocol — the tool that located
the round-2 scan-unroll win and the round-3 residual glue (BENCH.md).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import jax
    import jax.numpy as jnp
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.data import dataset
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)
    from reinforcement_learning_in_music_generation_tpu.train import (
        agent_train_step, optim)
    from reinforcement_learning_in_music_generation_tpu.utils import metrics

    import bench
    bench._setup_cache()

    B = int(os.environ.get("RLMG_BENCH_PRETRAIN_BATCH", "32"))
    S = int(os.environ.get("RLMG_BENCH_PRETRAIN_SEQ", "512"))
    cfg = C.agent_config(
        dtype=os.environ.get("RLMG_BENCH_TRAIN_DTYPE", "bfloat16"),
        attn_chunk=int(os.environ.get("RLMG_BENCH_ATTN_CHUNK", "128")),
        scan_unroll=12)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.adam(1e-4, grad_clip=3.0)
    opt_state = tx.init(params)
    x, y, mask = dataset.synthetic_cp_dataset(B, S, n_class=cfg.vocab_sizes)
    bx, by = jnp.asarray(x), jnp.asarray(y)
    bm = jnp.asarray(mask, jnp.float32)
    key = lambda i: jax.random.key(i, impl="rbg")

    params, opt_state, (loss, _) = agent_train_step(
        params, opt_state, cfg, tx, bx, by, bm, key(1))
    float(loss)

    log_dir = "/tmp/rlmg_trace_pretrain"
    with metrics.profile_trace(log_dir):
        for i in range(steps):
            params, opt_state, (loss, _) = agent_train_step(
                params, opt_state, cfg, tx, bx, by, bm, key(i + 2))
        float(loss)

    rows = metrics.summarize_trace(log_dir, top=1000, steps=steps)
    total = sum(us for _, us, _ in rows)
    print(f"backend={os.environ.get('RLMG_FFN_BACKEND', 'xla')} "
          f"B={B} S={S} steps={steps}")
    for kind, us, cnt in rows[:25]:
        print(f"{us:10.0f} us/step  {cnt:7.1f} ops  {kind}")
    tail = total - sum(us for _, us, _ in rows[:25])
    if tail > 0:
        print(f"{tail:10.0f} us/step  (long tail, {len(rows) - 25} kinds)")
    print(f"{total:10.0f} us/step TOTAL (device, all op kinds)")


if __name__ == "__main__":
    main()
