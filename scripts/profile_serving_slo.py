"""Serving SLO measurement (VERDICT r4 next #4): request p50/p99 latency
and songs/s for a MIXED prompt-length workload through the serve_requests
daemon loop — continuous batching and prompt prefill exercised together
(r4 benched them separately).

Workload: 24 requests — unconditional (continuous batcher) and
prompt-conditioned at prompt lengths {16, 128, 384} (prefill + bar-stop
sampler, bucket-padded seeds), songs/request in {1, 4}, 20 bars each.
Prompts are synthetic token rows ("synth:<len>" via the prompt_loader
hook), so the measurement isolates the serving path from MIDI parsing.

The daemon serves serially, so per-request latency = completion-time
delta; the report gives p50/p99 over the steady-state requests (first
request of each (shape) group pays its compile; reported separately as
cold_max_s) plus end-to-end songs/s.

Usage: python scripts/profile_serving_slo.py
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
from reinforcement_learning_in_music_generation_tpu.generate import serving
from reinforcement_learning_in_music_generation_tpu.models import (
    linear_transformer as lt)


def setup():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_requests():
    reqs = []
    i = 0
    tiny = os.environ.get("RLMG_PROFILE_TINY") == "1"
    for rep in range(2):                       # 2 waves: wave 1 compiles
        for plen in ((0, 16) if tiny else (0, 16, 128, 384)):
            for songs in ((1,) if tiny else (1, 4)):
                r = {"id": f"r{i}", "songs": songs, "bars": 20,
                     "seed": 100 + i}
                if plen:
                    r["prompt"] = f"synth:{plen}"
                r["_wave"] = rep
                reqs.append(r)
                i += 1
    return reqs


def main():
    setup()
    tiny = os.environ.get("RLMG_PROFILE_TINY") == "1"   # CPU smoke mode
    vocab = (56, 135, 18, 87, 18, 25)
    cfg = (C.agent_config(vocab, n_layer=1) if tiny
           else C.agent_config(vocab))
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    rng = np.random.default_rng(0)

    def prompt_loader(spec):
        n = int(spec.split(":")[1])
        rows = np.stack([rng.integers(0, v, size=n) for v in vocab],
                        axis=-1).astype(np.int32)
        rows[0] = np.asarray([0, 0, 1, 0, 0, 0])      # bar seed row
        return rows

    reqs = make_requests()
    path = "/tmp/slo_requests.jsonl"
    with open(path, "w") as f:
        for r in reqs:
            f.write(json.dumps({k: v for k, v in r.items()
                                if not k.startswith("_")}) + "\n")
    for p in (path + ".journal",):
        if os.path.exists(p):
            os.remove(p)

    lat, songs_done, toks = {}, 0, 0
    t_prev = [time.time()]
    t_start = time.time()

    def on_result(req, res):
        nonlocal songs_done, toks
        now = time.time()
        lat[req["id"]] = now - t_prev[0]
        t_prev[0] = now
        songs_done += len(res.songs)
        toks += sum(len(s) for s in res.songs)

    n = serving.serve_requests(
        params, cfg, path, on_result, batch=8, poll_s=0.05,
        max_requests=len(reqs),
        max_tokens_per_song=(64 if os.environ.get("RLMG_PROFILE_TINY") == "1" else 512),
        prompt_loader=prompt_loader)
    wall = time.time() - t_start
    assert n == len(reqs), (n, len(reqs))

    warm = sorted(lat[r["id"]] for r in reqs if r["_wave"] == 1)
    cold = [lat[r["id"]] for r in reqs if r["_wave"] == 0]
    p50 = warm[len(warm) // 2]
    p99 = warm[min(len(warm) - 1, int(len(warm) * 0.99))]
    out = dict(requests=n, wall_s=round(wall, 2),
               songs_per_s=round(songs_done / wall, 2),
               tokens_per_s=round(toks / wall, 1),
               warm_p50_s=round(p50, 3), warm_p99_s=round(p99, 3),
               warm_mean_s=round(sum(warm) / len(warm), 3),
               cold_max_s=round(max(cold), 2),
               songs=songs_done, tokens=toks)
    for r in reqs:
        if r["_wave"] == 1:
            print(f"  {r['id']}: songs={r['songs']} "
                  f"prompt={r.get('prompt', '-'):>10s} "
                  f"{lat[r['id']]:7.3f}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
