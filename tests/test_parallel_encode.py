"""Process-parallel corpus encoding: identical to sequential, in order."""

import numpy as np

from reinforcement_learning_in_music_generation_tpu.data import (
    cp_tokenizer, midifile, parallel_encode)


def write_corpus(tmp_path, n=6):
    paths = []
    for i in range(n):
        m = midifile.MidiFile()
        m.ticks_per_beat = 480
        m.tempo_changes = [midifile.TempoChange(90 + 10 * i, 0)]
        inst = midifile.Instrument(0)
        for j in range(4 + i):
            s = j * 480
            inst.notes.append(midifile.Note(60 + i, 50 + i + j, s, s + 480))
        m.instruments.append(inst)
        p = tmp_path / f"song{i}.mid"
        m.dump(str(p))
        paths.append(str(p))
    # one malformed file that must be skipped
    bad = tmp_path / "bad.mid"
    bad.write_bytes(b"not a midi")
    paths.insert(2, str(bad))
    return paths


def test_cp_parallel_matches_sequential(tmp_path):
    paths = write_corpus(tmp_path)
    seq = cp_tokenizer.build_cp_training_data(paths, seq_len=64, workers=1)
    par = cp_tokenizer.build_cp_training_data(paths, seq_len=64, workers=3)
    for a, b in zip(seq[:3], par[:3]):
        np.testing.assert_array_equal(a, b)
    assert seq[0].shape[0] == 6   # bad file skipped


def test_tuple_parallel_matches_sequential(tmp_path):
    paths = write_corpus(tmp_path)
    seq = parallel_encode.tuple_extract_corpus(paths, workers=1)
    par = parallel_encode.tuple_extract_corpus(paths, workers=3)
    assert len(seq) == len(par) == 6
    for a, b in zip(seq, par):
        assert a == b
