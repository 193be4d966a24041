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
