"""Data layer: MIDI round trip, tokenizer pipeline, dictionaries, chords,
dataset builders."""

import numpy as np
import pytest

from reinforcement_learning_in_music_generation_tpu.data import (
    chords, dataset, events, midifile, tokenizer)


def make_midi(path, notes_spec, tempo=120):
    m = midifile.MidiFile()
    m.ticks_per_beat = 480
    m.tempo_changes = [midifile.TempoChange(tempo, 0)]
    inst = midifile.Instrument(0)
    for start, end, pitch, vel in notes_spec:
        inst.notes.append(midifile.Note(vel, pitch, start, end))
    m.instruments.append(inst)
    m.dump(str(path))
    return m


def test_midifile_roundtrip(tmp_path):
    path = tmp_path / "t.mid"
    spec = [(0, 480, 60, 80), (480, 960, 64, 90), (480, 1440, 67, 70),
            (1920, 2400, 72, 100)]
    make_midi(path, spec, tempo=95)
    m = midifile.MidiFile(str(path))
    assert m.ticks_per_beat == 480
    assert len(m.instruments) == 1
    got = sorted((n.start, n.end, n.pitch, n.velocity) for n in m.instruments[0].notes)
    assert got == sorted(spec)
    assert abs(m.tempo_changes[0].tempo - 95) < 0.01


def test_midifile_markers_roundtrip(tmp_path):
    path = tmp_path / "t.mid"
    m = midifile.MidiFile()
    m.tempo_changes = [midifile.TempoChange(120, 0), midifile.TempoChange(150, 960)]
    m.markers = [midifile.Marker("C:maj", 0), midifile.Marker("G:dom", 960)]
    inst = midifile.Instrument(0)
    inst.notes.append(midifile.Note(70, 60, 0, 480))
    m.instruments.append(inst)
    m.dump(str(path))
    m2 = midifile.MidiFile(str(path))
    assert [mk.text for mk in m2.markers] == ["C:maj", "G:dom"]
    assert len(m2.tempo_changes) == 2
    assert abs(m2.tempo_changes[1].tempo - 150) < 0.01


def test_tuple_dict_class_sizes():
    e2w, w2e = tokenizer.construct_tuple_dict()
    # prepare_data.py:239-302: 46+3, 16+3, 16+3, 86+3, 64+3, 22+3
    assert tokenizer.n_classes(e2w) == [49, 19, 19, 89, 67, 25]
    assert e2w["Tempo"]["Tempo 28"] == 0
    assert e2w["Position"]["Position 0/16"] == 0
    assert w2e["Pitch"][0] == "Pitch 22"
    assert e2w["Velocity"]["Velocity <PAD>"] == 24


def test_cp_dict_class_sizes():
    full = tokenizer.construct_cp_dict()
    assert tokenizer.n_classes(full[0]) == [56, 135, 18, 3, 87, 18, 25]
    e2w, w2e = tokenizer.drop_type(full)
    # IRL_dqn_train.py:403 comment: [56, 135, 18, 87, 18, 25]
    assert tokenizer.n_classes(e2w) == [56, 135, 18, 87, 18, 25]
    assert w2e["bar-beat"][1] == "Bar"
    assert w2e["bar-beat"][2] == "Beat_0"


def test_tuple_event_pipeline_roundtrip(tmp_path):
    path = tmp_path / "song.mid"
    spec = []
    for bar in range(4):
        base = bar * 1920
        spec += [(base, base + 480, 60 + bar, 80), (base + 960, base + 1440, 64, 90)]
    make_midi(path, spec, tempo=120)

    tes = events.extract_tuple_events(str(path))
    assert len(tes) == len(spec)
    assert all(isinstance(e, events.GroupEvent) for e in tes)
    # positions quantized to /16 of a bar; pitches preserved
    assert tes[0].Pitch == 60 and tes[0].Position == "0/16"
    assert tes[1].Position == "8/16"
    assert tes[0].Tempo == 120

    # encode to words and back to midi
    e2w, w2e = tokenizer.construct_tuple_dict()
    grouped = events.group_by_bar(tes)
    words = tokenizer.tuple_events_to_words([grouped], e2w)[0]
    assert words[0][0][0] == e2w["Tempo"]["Tempo 120"]
    out = tmp_path / "rt.mid"
    tokenizer.tuple_events_to_midi(tes, str(out))
    m2 = midifile.MidiFile(str(out))
    got = sorted((n.start, n.pitch) for n in m2.instruments[0].notes)
    assert got == sorted((s, p) for s, _, p, _ in spec)


def test_cp_write_midi(tmp_path):
    _, w2e = tokenizer.drop_type(tokenizer.construct_cp_dict())
    e2w = {k: {v: i for i, v in m.items()} for k, m in w2e.items()}
    tempo_tok = min(
        (t for t in e2w["tempo"] if isinstance(t, str) and t.startswith("Tempo_")),
        key=lambda s: abs(int(s.split("_")[1]) - 120))
    tempo_bpm = int(tempo_tok.split("_")[1])
    rows = [
        [0, 0, e2w["bar-beat"]["Bar"], 0, 0, 0],
        [e2w["tempo"][tempo_tok], 0, e2w["bar-beat"]["Beat_0"], 0, 0, 0],
        [0, 0, 0, e2w["pitch"]["Note_Pitch_60"],
         e2w["duration"]["Note_Duration_480"], e2w["velocity"]["Note_Velocity_80"]],
        [0, 0, e2w["bar-beat"]["Beat_8"], 0, 0, 0],
        [0, 0, 0, e2w["pitch"]["Note_Pitch_64"],
         e2w["duration"]["Note_Duration_240"], e2w["velocity"]["Note_Velocity_60"]],
    ]
    path = tmp_path / "cp.mid"
    tokenizer.write_midi_cp(np.array(rows), str(path), w2e)
    m = midifile.MidiFile(str(path))
    notes = sorted(m.instruments[0].notes, key=lambda n: n.start)
    assert (notes[0].pitch, notes[0].start, notes[0].end) == (60, 1920, 2400)
    assert (notes[1].pitch, notes[1].start) == (64, 1920 + 8 * 120)
    assert abs(m.tempo_changes[0].tempo - tempo_bpm) < 0.01


def test_chord_recognition():
    # C major triad held for 2 beats -> C:maj
    notes = [midifile.Note(80, p, 0, 960) for p in (60, 64, 67)]
    out = chords.extract_chords(notes)
    assert out and out[0][2].startswith("C:maj")
    # A minor
    notes = [midifile.Note(80, p, 0, 960) for p in (57, 60, 64)]
    out = chords.extract_chords(notes)
    assert out and out[0][2].startswith("A:min")


def test_remi_pipeline(tmp_path):
    path = tmp_path / "song.mid"
    spec = [(0, 480, 60, 80), (960, 1440, 64, 90), (1920, 2400, 67, 70)]
    make_midi(path, spec)
    evs = events.extract_remi_events(str(path), with_chords=True)
    names = [e.name for e in evs]
    assert "Bar" in names and "Note On" in names and "Tempo Class" in names


def test_prepare_data_windows():
    e2w, _ = tokenizer.construct_tuple_dict()
    # 20 bars of 3 notes each
    note = [0, -1, 0, 10, 5, 3]
    song = [[list(note) for _ in range(3)] for _ in range(20)]
    arr = dataset.prepare_data_for_training([song], e2w, max_len=64)
    assert arr.shape[1:] == (64, 6)
    assert arr.shape[0] == 1    # stride 16: one full window fits
    window = arr[0]
    # first 48 rows are notes with bar ids 0..15, remainder PAD
    bar_ids = window[:48, 1]
    assert bar_ids.min() == 0 and bar_ids.max() == 15
    pad = [e2w[etype][f"{etype} <PAD>"] for etype in e2w]
    assert (window[48:] == pad).all()


def test_process_data_padding():
    songs = [[[1, 2, 3, 4, 5, 6]] * 10, [[6, 5, 4, 3, 2, 1]] * 30,
             [[1, 1, 1, 1, 1, 1]] * 20, [[2, 2, 2, 2, 2, 2]] * 5]
    packed = dataset.process_data(songs, max_seq_len=20, seed=None)
    assert packed["train_x"].shape == (2, 20, 6)
    assert packed["mask"].shape == (2, 20)
    assert packed["mask"][0].sum() == 10    # first song: 10 valid
    assert packed["mask"][1].sum() == 20    # second truncated to 20


def test_synthetic_cp_dataset():
    x, y, mask = dataset.synthetic_cp_dataset(4, 64)
    assert x.shape == (4, 64, 6) and mask.shape == (4, 64)
    n_class = (56, 135, 18, 87, 18, 25)
    for i, n in enumerate(n_class):
        assert x[..., i].max() < n
    # y is next-token shift of x
    assert (y[:, :-1] == x[:, 1:]).all()


def test_remi_writer_roundtrip(tmp_path):
    """REMI flat-token decode (D11c): build a small REMI word stream from the
    event vocabulary and check the written MIDI."""
    # build a flat word list: Bar, Position 1/16, Note Velocity 10, Note On 60,
    # Note Duration 7, Bar, Position 9/16, Velocity 12, Note On 64, Duration 3
    vocab = [
        "Bar_None", "Position_1/16", "Note Velocity_10", "Note On_60",
        "Note Duration_7", "Position_9/16", "Note Velocity_12", "Note On_64",
        "Note Duration_3", "Tempo Class_mid", "Tempo Value_30",
    ]
    word2event = {i: w for i, w in enumerate(vocab)}
    words = [0, 1, 9, 10, 1, 2, 3, 4, 0, 5, 6, 7, 8, 0, 0, 0]
    path = tmp_path / "remi.mid"
    tokenizer.write_midi_remi(words, word2event, str(path))
    m = midifile.MidiFile(str(path))
    notes = sorted(m.instruments[0].notes, key=lambda n: n.start)
    assert [n.pitch for n in notes] == [60, 64]
    # first note at bar 0 position 0 (value '1/16' -> index 0)
    assert notes[0].start == 0
    assert notes[0].end - notes[0].start == int(events.DEFAULT_DURATION_BINS[7])
    # second note in bar 1 at position index 8
    assert notes[1].start == 1920 + 8 * 120
    # tempo event decoded (mid class + 30 => 120 bpm)
    assert any(abs(t.tempo - 120) < 0.5 for t in m.tempo_changes)


def test_split_data_90_10(tmp_path):
    """split_data (ppo_policy/prepare_data.py:443-464): 90/10 sizes,
    disjoint shuffled coverage, both output pickles written."""
    import pickle

    from reinforcement_learning_in_music_generation_tpu.data import dataset

    songs = [[[i, 0, 0, 0, 0, 0]] * 3 for i in range(20)]
    src = tmp_path / "worded_data.pickle"
    with open(src, "wb") as f:
        pickle.dump({"train": songs}, f)
    n_train, n_test = dataset.split_data(str(src), seed=0)
    assert (n_train, n_test) == (18, 2)
    with open(tmp_path / "worded_data_train.pickle", "rb") as f:
        train = pickle.load(f)
    with open(tmp_path / "worded_data_test.pickle", "rb") as f:
        test = pickle.load(f)
    assert len(train) == 18 and len(test) == 2
    ids = sorted(s[0][0] for s in list(train) + list(test))
    assert ids == list(range(20))  # a partition, not a resample
    # raw-list input (no {'train': ...} wrapper) also accepted
    with open(src, "wb") as f:
        pickle.dump(songs, f)
    assert dataset.split_data(str(src), seed=1) == (18, 2)
