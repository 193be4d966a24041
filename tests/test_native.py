"""Native C++ data-loader core vs the pure-Python pipeline."""

import numpy as np
import pytest

from reinforcement_learning_in_music_generation_tpu.data import (
    events, midifile, native, tokenizer)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native midi core unavailable")


def make_midi(path, notes_spec, tempo=120):
    m = midifile.MidiFile()
    m.ticks_per_beat = 480
    m.tempo_changes = [midifile.TempoChange(tempo, 0)]
    inst = midifile.Instrument(0)
    for start, end, pitch, vel in notes_spec:
        inst.notes.append(midifile.Note(vel, pitch, start, end))
    m.instruments.append(inst)
    m.dump(str(path))


def test_native_parse_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    spec = []
    for bar in range(8):
        for _ in range(4):
            s = bar * 1920 + int(rng.integers(0, 16)) * 120
            d = int(rng.integers(1, 8)) * 120
            spec.append((s, s + d, int(rng.integers(30, 100)),
                         int(rng.integers(20, 110))))
    spec.sort()
    path = tmp_path / "t.mid"
    make_midi(path, spec, tempo=135)

    out = native.parse_midi(str(path))
    assert out is not None
    notes, tempos, tpb = out
    assert tpb == 480
    py = midifile.MidiFile(str(path))
    py_notes = sorted((n.start, n.end, n.pitch, n.velocity)
                      for n in py.instruments[0].notes)
    nat_notes = sorted(zip(notes["start"].tolist(), notes["end"].tolist(),
                           notes["pitch"].tolist(), notes["velocity"].tolist()))
    assert nat_notes == py_notes
    assert abs(tempos["bpm"][0] - 135) < 0.01


def test_native_quantize_matches_python():
    rng = np.random.default_rng(1)
    start = rng.integers(0, 10000, 200).astype(np.int32)
    end = start + rng.integers(60, 2000, 200).astype(np.int32)
    qs, qe = native.quantize(start, end, 120)
    # all snapped to grid, durations preserved
    assert (qs % 120 == 0).all()
    np.testing.assert_array_equal(qe - qs, end - start)
    # each snapped point is the nearest grid point
    assert (np.abs(qs - start) <= 60).all()


def test_native_encode_matches_python_pipeline(tmp_path):
    rng = np.random.default_rng(2)
    spec = []
    for bar in range(6):
        for _ in range(3):
            s = bar * 1920 + int(rng.integers(0, 16)) * 120
            d = int(rng.integers(1, 8)) * 120
            spec.append((s, s + d, int(rng.integers(30, 100)),
                         int(rng.integers(20, 86))))
    spec = sorted(set(spec))
    path = tmp_path / "t.mid"
    make_midi(path, spec, tempo=120)

    # python pipeline
    tes = events.extract_tuple_events(str(path))
    e2w, _ = tokenizer.construct_tuple_dict()
    grouped = events.group_by_bar(tes)
    py_words = [row for bar in tokenizer.tuple_events_to_words([grouped], e2w)[0]
                for row in bar]

    # native fused encoder (notes already on-grid in this corpus)
    start = np.array([s for s, *_ in spec], np.int32)
    end = np.array([e for _, e, *_ in spec], np.int32)
    pitch = np.array([p for _, _, p, _ in spec], np.int16)
    vel = np.array([v for *_, v in spec], np.int16)
    n_beats = int(end.max() // 480) + 1
    beat_bpm = np.full(n_beats, 120.0)
    words, bars = native.encode_tuple_words(start, end, pitch, vel, beat_bpm)

    assert len(py_words) == len(words)
    np.testing.assert_array_equal(np.asarray(py_words), words)
    np.testing.assert_array_equal(bars, start // 1920)
