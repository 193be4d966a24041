"""On-device sampling vs the reference's numpy semantics
(dqn_policy/model.py:19-55)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from reinforcement_learning_in_music_generation_tpu.ops import sampling as smp


def ref_nucleus_candidates(probs, p):
    """Reference nucleus candidate set (model.py:31-45), as a set of ids."""
    probs = probs / (probs.sum() + 1e-5)
    sorted_probs = np.sort(probs)[::-1]
    sorted_index = np.argsort(probs)[::-1]
    cusum = np.cumsum(sorted_probs)
    after = cusum > p
    if after.sum() > 0:
        last = np.where(after)[0][0] + 1
        return set(sorted_index[:last].tolist())
    return set(sorted_index.tolist())


def test_softmax_with_temperature_matches_numpy():
    logits = np.random.default_rng(0).normal(size=12).astype(np.float32)
    for t in (1.0, 1.2, 2.0, 5.0):
        ours = np.asarray(smp.softmax_with_temperature(jnp.asarray(logits), t))
        theirs = np.exp(logits / t) / np.sum(np.exp(logits / t))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_nucleus_mask_matches_reference_candidates():
    rng = np.random.default_rng(1)
    for trial in range(20):
        logits = rng.normal(size=16).astype(np.float32)
        probs = np.exp(logits) / np.exp(logits).sum()
        for p in (0.5, 0.9, 0.99):
            keep = np.asarray(smp.nucleus_mask(jnp.asarray(probs), p))
            ours = set(np.where(keep)[0].tolist())
            theirs = ref_nucleus_candidates(probs, p)
            assert ours == theirs, (trial, p, ours, theirs)


def test_nucleus_always_keeps_top_token():
    probs = jnp.asarray([0.96, 0.02, 0.01, 0.01])
    keep = np.asarray(smp.nucleus_mask(probs, 0.5))
    assert keep[0] and not keep[1:].any()


def test_sample_respects_nucleus_support():
    logits = jnp.asarray([5.0, 4.0, -10.0, -10.0])
    draws = [int(smp.sample(jax.random.PRNGKey(i), logits, top_p=0.9))
             for i in range(50)]
    assert set(draws) <= {0, 1}


def test_greedy_is_argmax():
    logits = jnp.asarray([[0.1, 3.0, -1.0], [2.0, 0.0, 1.0]])
    out = smp.sample(jax.random.PRNGKey(0), logits, greedy=True)
    np.testing.assert_array_equal(np.asarray(out), [1, 0])


def test_sample_fields_shapes_and_ranges():
    logits = [jnp.zeros((3, v)) for v in (5, 6, 7, 8, 9, 10)]
    out = smp.sample_fields(jax.random.PRNGKey(0), logits)
    assert out.shape == (3, 6)
    for i, v in enumerate((5, 6, 7, 8, 9, 10)):
        assert int(out[..., i].max()) < v


def test_temperature_flattens_distribution():
    logits = jnp.asarray([3.0, 0.0, 0.0, 0.0])
    p1 = np.asarray(smp.softmax_with_temperature(logits, 1.0))
    p5 = np.asarray(smp.softmax_with_temperature(logits, 5.0))
    assert p5[0] < p1[0]
    assert p5[1] > p1[1]

# --- fused all-fields sampler (ops/sampling.py:sample_fields_fused) -------

VOCAB = (56, 135, 18, 87, 18, 25)


def _cat_logits(rng, batch):
    return jnp.asarray(rng.normal(size=(batch, sum(VOCAB))).astype(np.float32))


def test_fused_greedy_matches_per_field():
    rng = np.random.default_rng(7)
    cat = _cat_logits(rng, 16)
    per_field = jnp.split(cat, np.cumsum(VOCAB)[:-1].tolist(), axis=-1)
    a = smp.sample_fields(jax.random.PRNGKey(0), per_field, greedy=True)
    b = smp.sample_fields_fused(jax.random.PRNGKey(0), cat, VOCAB, greedy=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_matches_per_field_under_shared_uniform():
    """Token-exact vs `sample` for the top_p fields when the inverse-CDF
    uniform is shared (the two only differ by float summation order;
    boundary flips are ~0 on random logits)."""
    rng = np.random.default_rng(8)
    batch = 64
    cat = _cat_logits(rng, batch)
    per_field = jnp.split(cat, np.cumsum(VOCAB)[:-1].tolist(), axis=-1)
    key = jax.random.PRNGKey(3)
    rngs = jax.random.split(key, 6)
    # the uniforms `sample` will draw internally, per top_p field
    us = [jax.random.uniform(r, (batch, 1))[:, 0] for r in rngs]
    fused = np.asarray(smp.sample_fields_fused(
        None, cat, VOCAB, smp.CP_SAMPLING,
        uniforms=jnp.stack(us, axis=-1)))
    n_cmp = 0
    n_match = 0
    for f, st in enumerate(smp.CP_SAMPLING):
        if st.top_p is None:
            continue
        ref = np.asarray(smp.sample(rngs[f], per_field[f],
                                    temperature=st.temperature,
                                    top_p=st.top_p))
        n_cmp += batch
        n_match += int((ref == fused[:, f]).sum())
    assert n_cmp == 4 * batch
    assert n_match >= n_cmp - 2, (n_match, n_cmp)


@pytest.mark.slow  # statistical distribution check (~33s), not a regression guard
def test_fused_no_top_p_fields_respect_distribution():
    """barbeat/velocity (no top_p) go through the inverse-CDF path; check
    frequencies against the temperature softmax on a peaked distribution."""
    logits = np.full((1, sum(VOCAB)), -40.0, np.float32)
    # barbeat field (idx 2, offset 56+135): two live tokens 2:1
    off = 56 + 135
    logits[0, off + 3] = 1.0
    logits[0, off + 5] = 1.0 - 1.2 * np.log(2.0)  # half as likely at t=1.2
    cat = jnp.tile(jnp.asarray(logits), (4000, 1))
    toks = np.asarray(smp.sample_fields_fused(
        jax.random.PRNGKey(0), cat, VOCAB, smp.CP_SAMPLING))[:, 2]
    counts = np.bincount(toks, minlength=18)
    assert set(np.where(counts)[0]) <= {3, 5}
    ratio = counts[3] / max(counts[5], 1)
    assert 1.6 < ratio < 2.5, ratio


def test_fused_respects_nucleus_support():
    """top_p fields must never emit tokens outside the nucleus."""
    logits = np.full((1, sum(VOCAB)), -30.0, np.float32)
    logits[0, 0] = 5.0      # tempo: one dominant token, p=0.9 keeps it only
    logits[0, 1] = 4.0
    cat = jnp.tile(jnp.asarray(logits), (500, 1))
    toks = np.asarray(smp.sample_fields_fused(
        jax.random.PRNGKey(1), cat, VOCAB, smp.CP_SAMPLING))[:, 0]
    assert set(toks.tolist()) <= {0, 1}
