"""MIDI -> CP encoder: structure, decode round trip, training data layout."""

import numpy as np

from reinforcement_learning_in_music_generation_tpu.data import (
    cp_tokenizer, midifile, tokenizer)


def make_midi(path, notes_spec, tempo=120):
    m = midifile.MidiFile()
    m.ticks_per_beat = 480
    m.tempo_changes = [midifile.TempoChange(tempo, 0)]
    inst = midifile.Instrument(0)
    for start, end, pitch, vel in notes_spec:
        inst.notes.append(midifile.Note(vel, pitch, start, end))
    m.instruments.append(inst)
    m.dump(str(path))


def test_encode_structure(tmp_path):
    path = tmp_path / "t.mid"
    spec = [(0, 480, 60, 80), (480, 960, 64, 72), (1920, 2400, 67, 60)]
    make_midi(path, spec)
    enc = cp_tokenizer.CPEncoder()
    rows = enc.encode(str(path), with_chords=False)
    assert rows.shape[1] == 7
    e2w = enc.e2w
    type_col = rows[:, 3]
    # first row is a Bar metrical row
    assert rows[0, 2] == e2w["bar-beat"]["Bar"]
    assert type_col[0] == e2w["type"]["Metrical"]
    # exactly 3 note rows, pitches in order
    note_rows = rows[type_col == e2w["type"]["Note"]]
    assert len(note_rows) == 3
    pitch_ids = [e2w["pitch"][f"Note_Pitch_{p}"] for p in (60, 64, 67)]
    assert note_rows[:, 4].tolist() == pitch_ids
    # ends with EOS
    assert type_col[-1] == e2w["type"]["EOS"]
    # two bars -> two Bar rows
    assert int((rows[:, 2] == e2w["bar-beat"]["Bar"]).sum()) == 2


def test_encode_decode_roundtrip(tmp_path):
    path = tmp_path / "t.mid"
    spec = []
    for bar in range(3):
        base = bar * 1920
        spec += [(base, base + 480, 60 + bar, 80),
                 (base + 960, base + 1440, 72 - bar, 60)]
    make_midi(path, spec, tempo=120)
    enc = cp_tokenizer.CPEncoder()
    rows = enc.encode(str(path), with_chords=False)
    # drop type column -> decoder format
    rows6 = np.delete(rows, 3, axis=1)
    w2e = {k: v for k, v in enc.w2e.items() if k != "type"}
    out = tmp_path / "rt.mid"
    tokenizer.write_midi_cp(rows6, str(out), w2e)
    m = midifile.MidiFile(str(out))
    got = sorted((n.start, n.pitch, n.end - n.start)
                 for n in m.instruments[0].notes)
    # the CP decoder's bar counter is 1-based (write_midi_cp increments on
    # each 'Bar' row, testing-no-type-cp.py:77-78), so decoded content sits
    # one bar later — a uniform 1920-tick shift
    want = sorted((s + 1920, p, e - s) for s, e, p, _ in spec)
    assert got == want


def test_chord_tokens_present(tmp_path):
    path = tmp_path / "t.mid"
    # sustained C major triad -> chord recognizer fires
    spec = [(0, 1920, p, 80) for p in (60, 64, 67)] + [(1920, 2400, 72, 80)]
    make_midi(path, spec)
    enc = cp_tokenizer.CPEncoder()
    rows = enc.encode(str(path), with_chords=True)
    chord_col = rows[:, 1]
    names = [enc.w2e["chord"].get(int(c)) for c in chord_col if c > 1]
    assert any(isinstance(n, str) and n.startswith("C_M") for n in names)


def test_build_training_data(tmp_path):
    for i in range(3):
        spec = [(b * 1920, b * 1920 + 480, 60 + i + b, 70) for b in range(4)]
        make_midi(tmp_path / f"s{i}.mid", spec)
    paths = [str(tmp_path / f"s{i}.mid") for i in range(3)]
    x, y, mask, (e2w, w2e) = cp_tokenizer.build_cp_training_data(
        paths, seq_len=64, with_type=True, with_chords=False)
    assert x.shape == (3, 64, 7)
    assert (y[:, :-1] == x[:, 1:]).all()
    assert mask.sum(axis=1).min() > 0
    # no-type variant matches the model vocab [56,135,18,87,18,25]
    x6, y6, m6, _ = cp_tokenizer.build_cp_training_data(
        paths, seq_len=64, with_type=False, with_chords=False)
    assert x6.shape == (3, 64, 6)
    for i, n in enumerate((56, 135, 18, 87, 18, 25)):
        assert x6[..., i].max() < n


def test_prompt_continuation_generation(tmp_path):
    """Encode a prompt MIDI, seed generation with it, decode the result."""
    import jax
    from reinforcement_learning_in_music_generation_tpu import config as C
    from reinforcement_learning_in_music_generation_tpu.generate import sampler
    from reinforcement_learning_in_music_generation_tpu.models import (
        linear_transformer as lt)

    path = tmp_path / "prompt.mid"
    make_midi(path, [(0, 480, 60, 80), (960, 1440, 64, 70)])
    enc = cp_tokenizer.CPEncoder()
    rows = np.delete(enc.encode(str(path), with_chords=False), 3, axis=1)

    cfg = C.LinearTransformerConfig(
        vocab_sizes=(56, 135, 18, 87, 18, 25), emb_sizes=(8,) * 6,
        d_model=16, n_layer=1, n_head=2, d_inner=32)
    params = lt.init_params(jax.random.PRNGKey(0), cfg)
    gcfg = C.GenerateConfig(max_tokens=16, bar_production=50, batch_size=1)
    songs = sampler.generate_songs(params, cfg, gcfg, init=rows)
    assert len(songs) == 1
    # output begins with the prompt rows verbatim
    np.testing.assert_array_equal(songs[0][: len(rows)], rows)
    assert len(songs[0]) > len(rows)
