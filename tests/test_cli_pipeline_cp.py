"""End-to-end CP pipeline through the CLI: raw MIDI corpus -> CP npz +
dictionary -> pretrain one step from that data (the full DQN-side data
path the reference could only run with the external Pop1K7 download)."""

import os
import sys

import numpy as np


from test_e2e_pipeline import make_corpus  # noqa: E402


def test_cp_prepare_then_pretrain(tmp_path):
    from reinforcement_learning_in_music_generation_tpu.apps import cli

    corpus = tmp_path / "midis"
    out = tmp_path / "cp"
    make_corpus(str(corpus), n_songs=4, n_bars=24)
    cli.main(["prepare-data", "--midi-folder", str(corpus),
              "--save-folder", str(out), "--scheme", "cp",
              "--cp-seq-len", "96"])
    npz = np.load(out / "train_data_linear.npz")
    assert npz["x"].shape == (4, 96, 7)
    assert npz["mask"].sum() > 0

    cli.main(["pretrain",
              "--train-data", str(out / "train_data_linear.npz"),
              "--dictionary", str(out / "dictionary.pkl"),
              "--seq-len", "96", "--layers", "1", "--epochs", "1",
              "--batch-size", "2",
              "--ckpt-dir", str(tmp_path / "ckpt"),
              "--exp-dir", str(tmp_path / "exp")])
    log = (tmp_path / "exp" / "log.txt").read_text()
    assert "batch loss" in log
