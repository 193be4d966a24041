"""CLI smoke for the RL fine-tune and generation entry points.

The rl/ library is unit-tested (test_rl.py); these drive the argparse ->
config -> loop composition in apps/cli.py end-to-end at tiny shapes —
the surfaces a reference user actually invokes (IRL_dqn_train.py,
ppo_train.py, testing-no-type-cp.py, inference.py)."""

import os
import sys

import pytest




pytestmark = pytest.mark.slow  # end-to-end CLI loops (~70s CPU); run with -m "" or -m slow

def _cli():
    from reinforcement_learning_in_music_generation_tpu.apps import cli
    return cli


def test_dqn_train_smoke(tmp_path):
    cli = _cli()
    cli.main([
        "dqn-train", "--synthetic", "--synthetic-songs", "2",
        "--seq-len", "128", "--layers", "1", "--songs", "3",
        "--episodes", "4", "--buffer-size", "8", "--batch-size", "4",
        "--n-states", "16", "--n-actions", "8", "--max-updates", "1",
        "--ckpt-epoch-gate", "0",
        "--ckpt-dir", str(tmp_path / "ck"), "--exp-dir", str(tmp_path / "exp"),
    ])
    assert (tmp_path / "ck" / "dqn_last.ckpt").exists()
    # gate 0: the best-ckpt branch ran -> agent_info.pickle record with the
    # reference's exact keys (IRL_dqn_train.py:380-383, incl. the literal
    # ' global_loss' leading space)
    assert (tmp_path / "ck" / "dqn_best.ckpt").exists()
    import pickle
    with open(tmp_path / "ck" / "agent_info.pickle", "rb") as f:
        record = pickle.load(f)
    assert set(record) == {"Agent", "first_loss", "sec_loss", " global_loss"}
    assert len(record["first_loss"]) == 1 and record["Agent"].shape[0] == 4


def test_ppo_train_smoke(tmp_path):
    cli = _cli()
    cli.main([
        "ppo-train", "--synthetic", "--synthetic-songs", "2",
        "--seq-len", "128", "--layers", "1", "--songs", "1",
        "--episodes", "4", "--n-states", "16", "--n-actions", "8",
        "--ppo-steps", "1",
        "--ckpt-dir", str(tmp_path / "ck"), "--exp-dir", str(tmp_path / "exp"),
    ])
    assert (tmp_path / "ck" / "ppo_best.ckpt").exists()


def test_inference_smoke(tmp_path):
    cli = _cli()
    out = tmp_path / "out.mid"
    cli.main(["inference", "--tokens", "8", "--layers", "1",
              "--out", str(out)])
    assert out.exists() and out.stat().st_size > 0
