"""Golden greedy-decode regression: fixed params + greedy sampling must
reproduce the exact token stream across refactors (the framework-level
equivalent of BASELINE.md's byte-identical greedy MIDI check — the
reference's external weights aren't available, so the golden is pinned to
the deterministic init)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.generate import sampler
from reinforcement_learning_in_music_generation_tpu.models import linear_transformer as lt
from reinforcement_learning_in_music_generation_tpu.ops import sampling as smp

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_greedy_tokens.json")

CFG = C.LinearTransformerConfig(
    vocab_sizes=(56, 135, 18, 87, 18, 25), emb_sizes=(16,) * 6,
    d_model=32, n_layer=2, n_head=2, d_inner=64)


def decode_tokens():
    params = lt.init_params(jax.random.PRNGKey(42), CFG)
    init = jnp.asarray([[list(sampler.CP_SEED)]], jnp.int32)
    res = sampler.generate_tokens(
        params, CFG, jax.random.PRNGKey(0), init, max_tokens=32,
        greedy=True, settings=tuple(smp.GREEDY))
    return np.asarray(res.tokens[0]).tolist()


def test_greedy_decode_matches_golden():
    tokens = decode_tokens()
    if not os.path.exists(GOLDEN_PATH):  # first run pins the golden
        with open(GOLDEN_PATH, "w") as f:
            json.dump(tokens, f)
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    assert tokens == golden, (
        "greedy decode diverged from the pinned golden stream — if the "
        "change is an intentional numerics change, delete "
        "tests/golden_greedy_tokens.json to re-pin")


def test_greedy_invariant_to_batch_size():
    """Greedy output must not depend on how many songs share the batch
    (VERDICT r3 weak #3): every song in a batch decodes independently, so
    B in {1, 5, 128} must yield the identical stream, and that stream must
    be the pinned golden."""
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    params = lt.init_params(jax.random.PRNGKey(42), CFG)
    for b in (1, 5, 128):
        init = jnp.tile(jnp.asarray([[list(sampler.CP_SEED)]], jnp.int32),
                        (b, 1, 1))
        res = sampler.generate_tokens(
            params, CFG, jax.random.PRNGKey(0), init, max_tokens=32,
            greedy=True, settings=tuple(smp.GREEDY))
        toks = np.asarray(res.tokens)
        for i in range(b):
            assert toks[i].tolist() == golden, (
                f"greedy stream for song {i} at batch {b} diverged")


def test_generate_songs_greedy_pins_bitstable_path(monkeypatch):
    """generate_songs(greedy=True) must never route through the v6
    persistent / fused throughput paths (their accumulation order flips
    argmax at near-ties).  Force the auto-dispatch predicates to claim the
    fused paths and check greedy output still equals the golden — i.e. the
    dispatch was never consulted.  (On CPU the fused kernels cannot even
    lower, so taking them would hard-fail too.)"""
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    monkeypatch.setattr(sampler, "use_persistent_decode", lambda **kw: True)
    monkeypatch.setattr(sampler, "use_fused_decode", lambda: True)
    monkeypatch.delenv("RLMG_PERSISTENT_DECODE", raising=False)
    monkeypatch.delenv("RLMG_FUSED_DECODE", raising=False)
    monkeypatch.delenv("RLMG_FUSED_SAMPLING", raising=False)
    params = lt.init_params(jax.random.PRNGKey(42), CFG)
    gen_cfg = C.GenerateConfig(batch_size=5, max_tokens=32,
                               bar_production=10**9, greedy=True)
    songs = sampler.generate_songs(params, CFG, gen_cfg,
                                   rng=jax.random.PRNGKey(0))
    assert len(songs) == 5
    for s in songs:
        assert s.tolist() == golden
