"""End-to-end quality regression gate (VERDICT r4 next #9).

The docs/curves PNGs show real learning; this test PINS it: pretrain the
small config on the bundled synthetic corpus, then assert
  (a) the loss trajectory clears absolute thresholds (a learning
      regression — optimizer, loss, kernels, schedule — fails it), and
  (b) generated music satisfies grammar invariants: stochastic
      generation reaches the bar budget well inside the token budget
      (the bar/beat grammar was actually learned — the synthetic corpus
      places a Bar row every 8 positions), every field stays in vocab,
      and the decoded MIDI parses back with notes.

Mirrors the reference's only quality signals — loss-bucket gates
(dqn_policy/agent_pretrain.py:594-632) and eyeball decode checks
(data_midi.py:39-56) — as an automated regression test.

Thresholds were calibrated on this exact configuration (r5): loss
3.60 -> 2.23 over 15 epochs (floor ~2.22 — the random note fields are
irreducible), all songs reach 5 bars within 25-35 tokens.  Gates carry
~10% / 3x margins so only real regressions trip them.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.data import (
    dataset, midifile, tokenizer)
from reinforcement_learning_in_music_generation_tpu.generate import sampler
from reinforcement_learning_in_music_generation_tpu.models import (
    linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.train import pretrain as pt

CFG = C.LinearTransformerConfig(
    vocab_sizes=(56, 135, 18, 87, 18, 25), emb_sizes=(16,) * 6,
    d_model=64, n_layer=2, n_head=4, d_inner=128, dropout=0.1)


@pytest.mark.slow
def test_pretrain_generate_quality_gate(tmp_path):
    x, y, mask = dataset.synthetic_cp_dataset(16, 128)
    params = lt.init_params(jax.random.PRNGKey(0), CFG)
    pcfg = C.PretrainConfig(n_epoch=15, batch_size=8, lr=3e-3,
                            ckpt_dir=str(tmp_path / "ckpt"),
                            exp_dir=str(tmp_path / "exp"))
    params, _, hist = pt.pretrain(params, CFG, x, y, mask, pcfg)

    # -- learning gate (calibrated: 3.60 -> 2.23, floor ~2.22) --
    assert hist[0] > 3.0, f"init loss suspiciously low: {hist[0]}"
    assert hist[-1] < 2.45, (
        f"final loss {hist[-1]:.3f} above the 2.45 gate — learning "
        f"regression (calibrated plateau ~2.23)")
    assert hist[-1] < hist[0] - 1.0, "loss barely moved"

    # -- grammar gate: stochastic generation, CP sampling settings --
    bar_cond, max_tokens = 5, 200
    gen = sampler.generate_tokens(
        params, CFG, jax.random.PRNGKey(3),
        jnp.tile(jnp.asarray([sampler.CP_SEED], jnp.int32)[None],
                 (4, 1, 1)),
        max_tokens=max_tokens, bar_cond=bar_cond, greedy=False,
        fused=False, fused_sampling=True)
    n_bars = np.asarray(gen.n_bars)
    valid = np.asarray(gen.valid)
    toks = np.asarray(gen.tokens)
    assert (n_bars >= bar_cond).all(), (
        f"songs did not reach {bar_cond} bars: {n_bars} — the bar "
        f"grammar was not learned")
    # calibrated 25-35 valid tokens for 5 bars (grammar ~1 bar / 8 rows);
    # hitting the 200-token budget means bars stopped being emitted
    assert valid.sum(1).max() < 120, (
        f"bar budget took {valid.sum(1).max()} tokens — grammar degraded")
    for f, v in enumerate(CFG.vocab_sizes):
        sel = toks[..., f][valid]
        assert sel.min() >= 0 and sel.max() < v, (f, v, sel.min(),
                                                  sel.max())
    # bar counting is cumulative: prefix counts never exceed the final
    bar_cum = np.cumsum(toks[..., 2] == 1, axis=1) * valid
    assert (bar_cum.max(axis=1) <= n_bars).all()

    # -- decode gate: every song writes a parseable MIDI with notes --
    dicts = tokenizer.drop_type(tokenizer.construct_cp_dict())
    _, w2e = dicts
    for i in range(toks.shape[0]):
        path = str(tmp_path / f"gate_{i}.mid")
        tokenizer.write_midi_cp(toks[i][valid[i]], path, w2e)
        mf = midifile.MidiFile(path)
        notes = [n for ins in mf.instruments for n in ins.notes]
        assert notes, f"song {i}: decoded MIDI has no notes"
        assert all(n.start >= 0 and n.end > n.start for n in notes), (
            f"song {i}: malformed note times")
        assert mf.tempo_changes, f"song {i}: no tempo events"
