"""On-device sampling vs the reference's numpy semantics
(dqn_policy/model.py:19-55)."""

import jax
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
