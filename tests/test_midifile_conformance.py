"""SMF conformance for data/midifile.py against hand-built raw bytes.

No independent MIDI library exists in this environment (miditoolkit/mido/
pretty_midi are absent), so the corpus is synthesized by an independent
writer: raw Standard-MIDI-File bytes assembled event-by-event in this
test, per the SMF 1.0 spec.  Covers the corner cases the own-parser-reads-
own-writer loop can hide (VERDICT r1, Missing #4): running status,
velocity-0 note-offs, format-0 multi-channel files, format-1 multi-track,
multi-byte delta times, overlapping same-pitch notes, sysex/meta skipping,
unknown chunks, dangling notes.  Semantics mirror miditoolkit
(the reference's parser, ppo_policy/utils.py:29-75).
"""

import struct

import numpy as np

from reinforcement_learning_in_music_generation_tpu.data import midifile


# --- independent raw-SMF writer ---------------------------------------------

def vlq(n: int) -> bytes:
    out = [n & 0x7F]
    n >>= 7
    while n:
        out.append(0x80 | (n & 0x7F))
        n >>= 7
    return bytes(reversed(out))


def track(events: bytes) -> bytes:
    body = events + vlq(0) + b"\xff\x2f\x00"
    return b"MTrk" + struct.pack(">I", len(body)) + body


def smf(fmt: int, tracks: list, division: int = 480) -> bytes:
    return (b"MThd" + struct.pack(">IHHH", 6, fmt, len(tracks), division)
            + b"".join(tracks))


def tempo_ev(delta: int, bpm: float) -> bytes:
    uspq = round(60e6 / bpm)
    return vlq(delta) + b"\xff\x51\x03" + uspq.to_bytes(3, "big")


# --- corpus ------------------------------------------------------------------

def test_format0_running_status_vel0_offs(tmp_path):
    """Format 0; note-ons under running status; note-offs expressed as
    running-status note-on velocity 0 (the most common real-world form)."""
    ev = bytearray()
    ev += vlq(0) + bytes([0xC0, 5])              # program 5 ch0
    ev += vlq(0) + bytes([0x90, 60, 100])        # explicit status
    ev += vlq(240) + bytes([64, 90])             # running status note-on
    ev += vlq(240) + bytes([60, 0])              # running status vel-0 off
    ev += vlq(240) + bytes([64, 0])              # running status vel-0 off
    p = tmp_path / "rs.mid"
    p.write_bytes(smf(0, [track(bytes(ev))]))

    m = midifile.MidiFile(str(p))
    assert m.ticks_per_beat == 480
    assert len(m.instruments) == 1
    inst = m.instruments[0]
    assert inst.program == 5
    got = [(n.start, n.end, n.pitch, n.velocity) for n in inst.notes]
    assert got == [(0, 480, 60, 100), (240, 720, 64, 90)]


def test_format0_multichannel_split(tmp_path):
    """A single format-0 track carrying three channels (incl. drums on 9)
    must split into per-channel instruments, like miditoolkit."""
    ev = bytearray()
    ev += vlq(0) + bytes([0xC0, 0])              # piano ch0
    ev += vlq(0) + bytes([0xC1, 32])             # bass  ch1
    ev += vlq(0) + bytes([0x90, 60, 80])
    ev += vlq(0) + bytes([0x91, 36, 70])
    ev += vlq(0) + bytes([0x99, 42, 110])        # drums ch9
    ev += vlq(480) + bytes([0x80, 60, 0])
    ev += vlq(0) + bytes([0x81, 36, 0])
    ev += vlq(0) + bytes([0x89, 42, 0])
    p = tmp_path / "mc.mid"
    p.write_bytes(smf(0, [track(bytes(ev))]))

    m = midifile.MidiFile(str(p))
    assert len(m.instruments) == 3
    piano, bass, drums = m.instruments       # ordered by channel (0, 1, 9)
    assert piano.program == 0 and piano.notes[0].pitch == 60 and not piano.is_drum
    assert bass.program == 32 and bass.notes[0].pitch == 36 and not bass.is_drum
    assert drums.is_drum and drums.notes[0].pitch == 42


def test_format1_multitrack_tempo_merge(tmp_path):
    """Format 1: conductor track with two tempi + two instrument tracks."""
    cond = tempo_ev(0, 120.0) + tempo_ev(1920, 90.0)
    t1 = (vlq(0) + bytes([0x90, 60, 64])
          + vlq(480) + bytes([0x80, 60, 0]))
    t2 = (vlq(960) + bytes([0x91, 72, 96])
          + vlq(480) + bytes([0x81, 72, 0]))
    p = tmp_path / "f1.mid"
    p.write_bytes(smf(1, [track(cond), track(t1), track(t2)]))

    m = midifile.MidiFile(str(p))
    assert [round(t.tempo) for t in m.tempo_changes] == [120, 90]
    assert [t.time for t in m.tempo_changes] == [0, 1920]
    assert len(m.instruments) == 2
    assert m.instruments[0].notes[0].pitch == 60
    assert m.instruments[1].notes[0].start == 960


def test_multibyte_delta_times(tmp_path):
    """Deltas that need 2- and 3-byte VLQs."""
    big1, big2 = 200, 100000
    ev = (vlq(big1) + bytes([0x90, 50, 64])
          + vlq(big2) + bytes([0x80, 50, 0]))
    p = tmp_path / "vlq.mid"
    p.write_bytes(smf(0, [track(ev)]))

    m = midifile.MidiFile(str(p))
    n = m.instruments[0].notes[0]
    assert (n.start, n.end) == (big1, big1 + big2)


def test_overlapping_same_pitch_fifo(tmp_path):
    """Two note-ons for the same pitch before any off: the first off closes
    the FIRST open note (FIFO, miditoolkit semantics)."""
    ev = (vlq(0) + bytes([0x90, 60, 10])
          + vlq(100) + bytes([0x90, 60, 20])
          + vlq(100) + bytes([0x80, 60, 0])     # closes the vel-10 note
          + vlq(100) + bytes([0x80, 60, 0]))    # closes the vel-20 note
    p = tmp_path / "ov.mid"
    p.write_bytes(smf(0, [track(ev)]))

    m = midifile.MidiFile(str(p))
    got = sorted((n.start, n.end, n.velocity) for n in m.instruments[0].notes)
    assert got == [(0, 200, 10), (100, 300, 20)]


def test_sysex_meta_and_unknown_chunks_skipped(tmp_path):
    """Sysex events, unknown meta types, CC/pitch-bend/aftertouch, and an
    unknown chunk between tracks must all be skipped without derailing."""
    ev = bytearray()
    ev += vlq(0) + bytes([0xF0]) + vlq(3) + b"\x01\x02\xf7"   # sysex
    ev += vlq(0) + b"\xff\x7f" + vlq(4) + b"\xde\xad\xbe\xef"  # seq-specific
    ev += vlq(0) + bytes([0xB0, 7, 100])          # CC volume
    ev += vlq(0) + bytes([0xE0, 0, 64])           # pitch bend
    ev += vlq(0) + bytes([0xA0, 60, 50])          # poly aftertouch
    ev += vlq(0) + bytes([0xD0, 40])              # channel aftertouch
    ev += vlq(10) + bytes([0x90, 61, 65])
    ev += vlq(480) + bytes([0x80, 61, 0])
    junk = b"XFIH" + struct.pack(">I", 4) + b"\x00\x00\x00\x00"
    p = tmp_path / "skip.mid"
    data = smf(0, [track(bytes(ev))])
    # header says 2 chunks; second is unknown and must be skipped
    data = (b"MThd" + struct.pack(">IHHH", 6, 0, 2, 480)
            + track(bytes(ev)) + junk)
    p.write_bytes(data)

    m = midifile.MidiFile(str(p))
    assert len(m.instruments) == 1
    n = m.instruments[0].notes[0]
    assert (n.start, n.end, n.pitch) == (10, 490, 61)


def test_dangling_note_closed_at_track_end(tmp_path):
    """A note-on with no off is closed at the last event tick."""
    ev = (vlq(0) + bytes([0x90, 60, 64])
          + vlq(480) + bytes([0x90, 62, 64])
          + vlq(480) + bytes([0x80, 62, 0]))     # pitch 60 never closed
    p = tmp_path / "dangle.mid"
    p.write_bytes(smf(0, [track(ev)]))

    m = midifile.MidiFile(str(p))
    got = {(n.pitch, n.start, n.end) for n in m.instruments[0].notes}
    assert (62, 480, 960) in got
    assert (60, 0, 960) in got


def test_time_signature_and_marker(tmp_path):
    ts = vlq(0) + b"\xff\x58\x04" + bytes([3, 2, 24, 8])       # 3/4
    mk = vlq(0) + b"\xff\x06" + vlq(5) + b"A:maj"
    ev = ts + mk + vlq(0) + bytes([0x90, 60, 64]) + vlq(480) + bytes([0x80, 60, 0])
    p = tmp_path / "meta.mid"
    p.write_bytes(smf(0, [track(ev)]))

    m = midifile.MidiFile(str(p))
    assert m.time_signature_changes[0].numerator == 3
    assert m.time_signature_changes[0].denominator == 4
    assert m.markers[0].text == "A:maj"


def test_cp_pipeline_on_conformance_file(tmp_path):
    """End-to-end: a format-0 running-status file goes through the CP
    encoder (MIDI -> CP rows) without error and yields note rows."""
    from reinforcement_learning_in_music_generation_tpu.data import cp_tokenizer

    ev = bytearray()
    ev += vlq(0) + bytes([0x90, 60, 100])
    for i, pitch in enumerate((64, 67, 72)):
        ev += vlq(480) + bytes([pitch, 80])       # running status ons
    for pitch in (60, 64, 67, 72):
        ev += vlq(240) + bytes([pitch, 0])        # running status offs
    p = tmp_path / "pipe.mid"
    p.write_bytes(smf(0, [track(bytes(ev))]))

    enc = cp_tokenizer.CPEncoder()
    rows = enc.encode(str(p), with_chords=False)
    type_col = rows[:, 3]
    note_rows = rows[type_col == enc.e2w["type"]["Note"]]
    assert len(note_rows) == 4
