"""AIRL re-scoring batch-size sweep (VERDICT r4 next #6).

The DQN composite epoch (BENCH_r04 dqn_epoch_composite_s = 1.74s) is
dominated by the two 20,000-entry buffer re-scoring passes
(rl/airl.py:calculate_reward, reference AIRL.py:69-90).  The reference
scores in batches of 100 (AIRL.py:78); nothing says 100 is the chip's
optimum.  This sweep times the full 20,000-state pass at batch sizes
{100, 500, 1000, 2000}.

Semantics caveat (the reason this is a REPORT, not a silent flip):
scoring runs the discriminator with per-batch BN statistics (train-mode
BN — the reference's actual behavior, rl/airl.py:99-114 analysis), so
the SCORES THEMSELVES depend on batch composition/size.  The sweep
therefore also reports score drift vs the reference batch size: mean
|delta| and Pearson r of the 20,000 scores against the bs=100 pass.

Timing: fetch-closed windows (block_until_ready no-ops on this
platform — bench.py methodology); one calculate_reward call is a single
jit program whose closing fetch forces the whole scan.

Usage: python scripts/profile_airl_score.py
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
from reinforcement_learning_in_music_generation_tpu.rl import airl

TINY = os.environ.get("RLMG_PROFILE_TINY") == "1"   # CPU smoke mode
N_BUFFER = 400 if TINY else 20000
N_STATES = 50


def setup():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    setup()
    vocab = (56, 135, 18, 87, 18, 25)
    wcfg = (C.WindowTransformerConfig(
                vocab_sizes=vocab, emb_sizes=(8,) * 6, d_model=16,
                n_layer=1, n_head=2, d_inner=32, max_pos=64,
                attention_window=8, with_score_head=True)
            if TINY else C.airl_discriminator_config(vocab))
    acfg = C.AIRLConfig()
    rstate = airl.init_state(jax.random.PRNGKey(1), wcfg, acfg)
    rng = jax.random.PRNGKey(2)
    states = jnp.stack(
        [jax.random.randint(jax.random.fold_in(rng, f),
                            (N_BUFFER, N_STATES), 0, v)
         for f, v in enumerate(vocab)], axis=-1).astype(jnp.int32)
    masks = jnp.ones((N_BUFFER, N_STATES), jnp.float32)

    out = {}
    ref_scores = None
    for bs in ((100, 200) if TINY else (100, 500, 1000, 2000)):
        def run():
            return airl.calculate_reward(rstate, wcfg, states, masks, bs)
        s = run()
        _ = np.asarray(s)             # compile + steady-state
        ts = []
        for _i in range(3):
            t0 = time.time()
            sc = run()
            sc_np = np.asarray(sc)    # closing fetch forces the pass
            ts.append(time.time() - t0)
        el = min(ts)
        sc_np = sc_np.reshape(-1)
        if bs == 100:
            ref_scores = sc_np
            drift, corr = 0.0, 1.0
        else:
            drift = float(np.mean(np.abs(sc_np - ref_scores)))
            corr = float(np.corrcoef(sc_np, ref_scores)[0, 1])
        out[f"bs{bs}"] = dict(pass_s=round(el, 4),
                              states_per_s=round(N_BUFFER / el, 1),
                              drift_vs_100=round(drift, 5),
                              corr_vs_100=round(corr, 5))
        print(f"bs={bs:5d}: {el:7.3f}s/pass  {N_BUFFER/el:10,.0f} states/s"
              f"  drift={drift:.5f}  r={corr:.5f}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
