"""End-to-end pipeline: synthetic MIDI corpus -> prepare-data -> preprocess
-> data-midi decode -> tiny pretrain -> generation -> MIDI out.

Exercises the full reference workflow (README.md:30-50) through the CLI
command functions.
"""

import os
import pickle
import sys

import numpy as np
import pytest


from reinforcement_learning_in_music_generation_tpu.data import midifile


def make_corpus(root, n_songs=3, n_bars=20, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for s in range(n_songs):
        m = midifile.MidiFile()
        m.ticks_per_beat = 480
        m.tempo_changes = [midifile.TempoChange(int(rng.integers(60, 180)), 0)]
        inst = midifile.Instrument(0)
        for bar in range(n_bars):
            base = bar * 1920
            for _ in range(int(rng.integers(1, 5))):
                start = base + int(rng.integers(0, 16)) * 120
                dur = int(rng.integers(1, 8)) * 120
                pitch = int(rng.integers(40, 90))
                vel = int(rng.integers(30, 87))
                inst.notes.append(midifile.Note(vel, pitch, start, start + dur))
        inst.notes.sort(key=lambda n: (n.start, n.pitch))
        m.instruments.append(inst)
        m.dump(os.path.join(root, f"song_{s}.mid"))


def test_full_pipeline(tmp_path):
    from reinforcement_learning_in_music_generation_tpu.apps import cli

    corpus = tmp_path / "midis"
    save = tmp_path / "dataset"
    make_corpus(str(corpus))

    # prepare-data (prepare_data.py pipeline)
    cli.main(["prepare-data", "--midi-folder", str(corpus),
              "--save-folder", str(save)])
    assert (save / "dictionary.pickle").exists()
    with open(save / "worded_data.pickle", "rb") as f:
        worded = pickle.load(f)
    assert len(worded) == 3 and len(worded[0]) > 0

    # preprocess (preprocess.py pipeline)
    out = save / "our_dataset.pickle"
    cli.main(["preprocess", "--worded-data", str(save / "worded_data.pickle"),
              "--out", str(out), "--max-seq-len", "64"])
    with open(out, "rb") as f:
        packed = pickle.load(f)
    assert packed["train_x"].shape[1:] == (64, 6)
    assert packed["mask"].shape == packed["train_x"].shape[:2]

    # data-midi sanity decode (data_midi.py)
    midi_out = tmp_path / "decode.mid"
    cli.main(["data-midi", "--dataset", str(out),
              "--dictionary", str(save / "dictionary.pickle"),
              "--row", "0", "--out", str(midi_out)])
    decoded = midifile.MidiFile(str(midi_out))
    assert decoded.instruments and len(decoded.instruments[0].notes) > 0
