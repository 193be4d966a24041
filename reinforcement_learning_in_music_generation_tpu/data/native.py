"""ctypes bindings for the C++ data-loader core (native/midi_core.cpp).

Provides the hot host-side paths — SMF parsing, grid quantization and the
fused tuple-event encoder — as native code, with transparent build-on-first-
use (g++ via the Makefile) and graceful fallback to the pure-Python
implementations in midifile.py / events.py when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmidi_core.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("RLMG_NO_NATIVE"):
        return None
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        i8, i16, i32, i64, f64 = (ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.POINTER(ctypes.c_int16),
                                  ctypes.POINTER(ctypes.c_int32),
                                  ctypes.POINTER(ctypes.c_int64),
                                  ctypes.POINTER(ctypes.c_double))
        lib.rlmg_parse_midi.restype = ctypes.c_int
        lib.rlmg_parse_midi.argtypes = [
            i8, ctypes.c_int64, i32, i32, i16, i16, i16, ctypes.c_int64, i64,
            i32, f64, ctypes.c_int64, i64, i32]
        lib.rlmg_quantize.restype = None
        lib.rlmg_quantize.argtypes = [i32, i32, ctypes.c_int64, ctypes.c_int32]
        lib.rlmg_encode_tuple.restype = None
        lib.rlmg_encode_tuple.argtypes = [
            i32, i32, i16, i16, ctypes.c_int64, f64, ctypes.c_int64, i32, i32]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def parse_midi(path: str):
    """Parse an SMF file natively.

    Returns (notes, tempos, ticks_per_beat) where notes is a structured dict
    of arrays {'start','end','pitch','velocity','track'} and tempos is
    {'tick','bpm'}.  None if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = np.frombuffer(f.read(), np.uint8)
    max_notes = max(1024, len(data))      # SMF note event is >= 3 bytes
    max_tempos = max(256, len(data) // 4)
    start = np.zeros(max_notes, np.int32)
    end = np.zeros(max_notes, np.int32)
    pitch = np.zeros(max_notes, np.int16)
    vel = np.zeros(max_notes, np.int16)
    track = np.zeros(max_notes, np.int16)
    t_tick = np.zeros(max_tempos, np.int32)
    t_bpm = np.zeros(max_tempos, np.float64)
    n_notes = ctypes.c_int64()
    n_tempos = ctypes.c_int64()
    tpb = ctypes.c_int32()
    rc = lib.rlmg_parse_midi(
        _ptr(data, ctypes.c_uint8), len(data),
        _ptr(start, ctypes.c_int32), _ptr(end, ctypes.c_int32),
        _ptr(pitch, ctypes.c_int16), _ptr(vel, ctypes.c_int16),
        _ptr(track, ctypes.c_int16), max_notes, ctypes.byref(n_notes),
        _ptr(t_tick, ctypes.c_int32), _ptr(t_bpm, ctypes.c_double),
        max_tempos, ctypes.byref(n_tempos), ctypes.byref(tpb))
    if rc != 0:
        raise ValueError(f"{path}: malformed MIDI (rc={rc})")
    n, m = n_notes.value, n_tempos.value
    notes = {"start": start[:n].copy(), "end": end[:n].copy(),
             "pitch": pitch[:n].copy(), "velocity": vel[:n].copy(),
             "track": track[:n].copy()}
    tempos = {"tick": t_tick[:m].copy(), "bpm": t_bpm[:m].copy()}
    return notes, tempos, tpb.value


def quantize(start: np.ndarray, end: np.ndarray, ticks: int = 120
             ) -> Tuple[np.ndarray, np.ndarray]:
    """Grid-snap (in place on copies).  Python fallback when unavailable."""
    start = np.ascontiguousarray(start, np.int32).copy()
    end = np.ascontiguousarray(end, np.int32).copy()
    lib = _load()
    if lib is None:
        snapped = np.round(start / ticks).astype(np.int32) * ticks
        shift = snapped - start
        return start + shift, end + shift
    lib.rlmg_quantize(_ptr(start, ctypes.c_int32), _ptr(end, ctypes.c_int32),
                      len(start), ticks)
    return start, end


def encode_tuple_words(start, end, pitch, vel, beat_bpm) -> Tuple[np.ndarray, np.ndarray]:
    """Fused tuple-event word encoder: -> (words (N,6) int32, bar_index (N,)).

    Requires the native library (use the events.py/tokenizer.py path
    otherwise)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native midi core unavailable")
    start = np.ascontiguousarray(start, np.int32)
    end = np.ascontiguousarray(end, np.int32)
    pitch = np.ascontiguousarray(pitch, np.int16)
    vel = np.ascontiguousarray(vel, np.int16)
    beat_bpm = np.ascontiguousarray(beat_bpm, np.float64)
    n = len(start)
    words = np.zeros((n, 6), np.int32)
    bar_index = np.zeros(n, np.int32)
    lib.rlmg_encode_tuple(
        _ptr(start, ctypes.c_int32), _ptr(end, ctypes.c_int32),
        _ptr(pitch, ctypes.c_int16), _ptr(vel, ctypes.c_int16), n,
        _ptr(beat_bpm, ctypes.c_double), len(beat_bpm),
        _ptr(words, ctypes.c_int32), _ptr(bar_index, ctypes.c_int32))
    return words, bar_index
