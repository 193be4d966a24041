"""Continuous-batching vs synchronous decode A/B (r4 serving feature).

generate/serving.py refills slots in-graph when a song completes; the
synchronous batcher (sampler.generate_songs via generate_tokens
bar-stop) runs each wave until its slowest song finishes.  The win is
the song-length tail: with bar_cond=50 the song lengths spread wide, so
a wave of B songs costs ~E[max of B] steps while continuous costs
~E[mean] + refill skew.  This measures both on the chip at the
reference-scale config.

Scenarios (12L d512 CP model, bf16 weights, stochastic sampling):
  * 64 songs x 50 bars on 16 slots (4 waves vs continuous)
  * 256 songs x 50 bars on 64 slots
Reports wall-clock, decode steps (continuous), and songs/sec for each
path.  The continuous path uses the XLA per-step decoder (the v6/v7
persistent kernels are whole-chunk programs — in-graph refill composes
with the scan path only).

Usage: python scripts/profile_serving.py [small|large|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.generate import (
    sampler, serving)
from reinforcement_learning_in_music_generation_tpu.models import (
    linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.ops import sampling as smp


def setup():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_params():
    # RLMG_PROFILE_LAYERS=2 gives a CPU-sized sanity config
    cfg = C.agent_config(
        n_layer=int(os.environ.get("RLMG_PROFILE_LAYERS", "12")))
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    return cfg, params


def run_continuous(params, cfg, n_songs, batch, bars, seed=0):
    t0 = time.time()
    res = serving.generate_songs_continuous(
        params, cfg, jax.random.PRNGKey(seed), n_songs=n_songs,
        bar_cond=bars, batch=batch, max_tokens_per_song=2048)
    dt = time.time() - t0
    total = sum(len(s) for s in res.songs)
    return dict(path="continuous", songs=len(res.songs), steps=res.steps,
                wall_s=dt, songs_per_s=len(res.songs) / dt,
                tok_per_s=total / dt)


def run_synchronous(params, cfg, n_songs, batch, bars, seed=0):
    """Waves of `batch` songs through the production generate_songs
    dispatch (auto-picks v4/v6 per batch)."""
    gcfg = C.GenerateConfig(n_songs=batch, bar_production=bars,
                            max_tokens=2048, greedy=False,
                            batch_size=batch, out_dir="/tmp/serve_ab",
                            seed=seed)
    waves = -(-n_songs // batch)
    t0 = time.time()
    total = 0
    n_done = 0
    for w in range(waves):
        songs = sampler.generate_songs(params, cfg, gcfg)
        n_done += len(songs)
        total += sum(len(s) for s in songs)
    dt = time.time() - t0
    return dict(path="synchronous", songs=n_done, waves=waves, wall_s=dt,
                songs_per_s=n_done / dt, tok_per_s=total / dt)


def scenario(params, cfg, n_songs, batch, bars=50):
    print(f"--- {n_songs} songs x {bars} bars on {batch} slots ---",
          flush=True)
    # warmup both programs (compiles excluded from timing).  The serve
    # loop buckets its buffer size, but warming with the exact timed
    # configuration guarantees the same program regardless of bucket.
    serving.generate_songs_continuous(
        params, cfg, jax.random.PRNGKey(1), n_songs=n_songs, bar_cond=bars,
        batch=batch, max_tokens_per_song=2048)
    r_c = run_continuous(params, cfg, n_songs, batch, bars)
    print(f"continuous : {r_c['songs']} songs  {r_c['wall_s']:.2f}s  "
          f"{r_c['songs_per_s']:.2f} songs/s  {r_c['tok_per_s']:.0f} tok/s  "
          f"steps={r_c['steps']}", flush=True)
    gcfg_warm = C.GenerateConfig(n_songs=batch, bar_production=bars,
                                 max_tokens=2048, batch_size=batch,
                                 out_dir="/tmp/serve_ab", seed=1)
    sampler.generate_songs(params, cfg, gcfg_warm)
    r_s = run_synchronous(params, cfg, n_songs, batch, bars)
    print(f"synchronous: {r_s['songs']} songs  {r_s['wall_s']:.2f}s  "
          f"{r_s['songs_per_s']:.2f} songs/s  {r_s['tok_per_s']:.0f} tok/s  "
          f"waves={r_s['waves']}", flush=True)
    print(f"speedup (songs/s): {r_c['songs_per_s'] / r_s['songs_per_s']:.2f}x",
          flush=True)


def main():
    setup()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cfg, params = make_params()
    if which in ("small", "all"):
        scenario(params, cfg, n_songs=64, batch=16)
    if which in ("large", "all"):
        scenario(params, cfg, n_songs=256, batch=64)


if __name__ == "__main__":
    main()
