// Native data-loader core: fast SMF (MIDI) parsing + tuple-event encoding.
//
// The reference's data pipeline is per-note Python loops over miditoolkit
// objects (ppo_policy/utils.py:29-207, prepare_data.py:97-340).  This module
// provides the hot paths as C++ operating on flat arrays, exposed via a C ABI
// for ctypes (reinforcement_learning_in_music_generation_tpu/data/native.py):
//
//   * rlmg_parse_midi    — SMF 0/1 -> note arrays + tempo events
//   * rlmg_quantize      — snap starts/ends to the 120-tick grid
//   * rlmg_encode_tuple  — quantized notes + tempo curve -> 6-field word rows
//                          (the item2event + convert_to_tuple_events +
//                           tuple_event_to_word fusion)
//
// Build: make -C native   (g++ -O2 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint32_t varint() {
    uint32_t v = 0;
    while (p < end) {
      uint8_t b = *p++;
      v = (v << 7) | (b & 0x7F);
      if (!(b & 0x80)) return v;
    }
    ok = false;
    return v;
  }
  uint32_t be32() {
    if (end - p < 4) { ok = false; return 0; }
    uint32_t v = (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
                 (uint32_t(p[2]) << 8) | uint32_t(p[3]);
    p += 4;
    return v;
  }
  uint16_t be16() {
    if (end - p < 2) { ok = false; return 0; }
    uint16_t v = (uint16_t(p[0]) << 8) | uint16_t(p[1]);
    p += 2;
    return v;
  }
};

}  // namespace

extern "C" {

// Parse an SMF buffer.  Fills note arrays (start, end, pitch, velocity,
// track) and tempo arrays (tick, bpm).  Returns 0 on success, negative on
// malformed input.  Out: n_notes, n_tempos, ticks_per_beat.
int rlmg_parse_midi(const uint8_t* data, int64_t len,
                    int32_t* note_start, int32_t* note_end,
                    int16_t* note_pitch, int16_t* note_vel,
                    int16_t* note_track, int64_t max_notes,
                    int64_t* n_notes_out,
                    int32_t* tempo_tick, double* tempo_bpm,
                    int64_t max_tempos, int64_t* n_tempos_out,
                    int32_t* ticks_per_beat_out) {
  Cursor c{data, data + len};
  if (len < 14 || std::memcmp(data, "MThd", 4) != 0) return -1;
  c.p += 4;
  uint32_t hlen = c.be32();
  c.be16();                      // format
  uint16_t ntracks = c.be16();
  uint16_t division = c.be16();
  if (division & 0x8000) return -2;  // SMPTE unsupported
  *ticks_per_beat_out = division;
  c.p = data + 8 + hlen;

  int64_t n_notes = 0, n_tempos = 0;
  int16_t note_track_idx = 0;

  for (uint16_t t = 0; t < ntracks && c.p < c.end; ++t) {
    if (c.end - c.p < 8) break;
    bool is_mtrk = std::memcmp(c.p, "MTrk", 4) == 0;
    c.p += 4;
    uint32_t tlen = c.be32();
    const uint8_t* track_end = c.p + tlen;
    if (!is_mtrk || track_end > c.end) { c.p = std::min(track_end, c.end); continue; }

    int64_t tick = 0;
    uint8_t status = 0;
    bool track_has_notes = false;
    // active note stacks: (channel<<8 | pitch) -> vector of (start, vel)
    std::vector<std::vector<std::pair<int64_t, uint8_t>>> active(16 * 128);

    Cursor tc{c.p, track_end};
    while (tc.p < tc.end && tc.ok) {
      tick += tc.varint();
      if (tc.p >= tc.end) break;
      uint8_t b = *tc.p;
      if (b & 0x80) { status = b; ++tc.p; }
      uint8_t ev = status & 0xF0;
      uint8_t ch = status & 0x0F;
      if (status == 0xFF) {
        if (tc.p >= tc.end) break;
        uint8_t mtype = *tc.p++;
        uint32_t mlen = tc.varint();
        if (tc.p + mlen > tc.end) break;
        if (mtype == 0x51 && mlen == 3) {
          uint32_t uspq = (uint32_t(tc.p[0]) << 16) | (uint32_t(tc.p[1]) << 8) |
                          uint32_t(tc.p[2]);
          if (uspq > 0 && n_tempos < max_tempos) {
            tempo_tick[n_tempos] = int32_t(tick);
            tempo_bpm[n_tempos] = 60e6 / double(uspq);
            ++n_tempos;
          }
        }
        tc.p += mlen;
      } else if (status == 0xF0 || status == 0xF7) {
        uint32_t slen = tc.varint();
        tc.p += slen;
      } else if (ev == 0x90 || ev == 0x80) {
        if (tc.end - tc.p < 2) break;
        uint8_t pitch = tc.p[0], vel = tc.p[1];
        tc.p += 2;
        auto& stack = active[(size_t(ch) << 7) | pitch];
        if (ev == 0x90 && vel > 0) {
          stack.emplace_back(tick, vel);
        } else if (!stack.empty()) {
          auto [start, v] = stack.front();
          stack.erase(stack.begin());
          if (tick > start && n_notes < max_notes) {
            note_start[n_notes] = int32_t(start);
            note_end[n_notes] = int32_t(tick);
            note_pitch[n_notes] = pitch;
            note_vel[n_notes] = v;
            note_track[n_notes] = note_track_idx;
            ++n_notes;
            track_has_notes = true;
          }
        }
      } else if (ev == 0xC0 || ev == 0xD0) {
        tc.p += 1;
      } else if (ev == 0xA0 || ev == 0xB0 || ev == 0xE0) {
        tc.p += 2;
      } else {
        break;  // malformed
      }
    }
    // close dangling notes at end-of-track
    for (size_t key = 0; key < active.size(); ++key) {
      for (auto& [start, v] : active[key]) {
        if (tick > start && n_notes < max_notes) {
          note_start[n_notes] = int32_t(start);
          note_end[n_notes] = int32_t(tick);
          note_pitch[n_notes] = int16_t(key & 0x7F);
          note_vel[n_notes] = v;
          note_track[n_notes] = note_track_idx;
          ++n_notes;
          track_has_notes = true;
        }
      }
    }
    if (track_has_notes) ++note_track_idx;
    c.p = track_end;
  }
  *n_notes_out = n_notes;
  *n_tempos_out = n_tempos;
  return 0;
}

// Snap note starts to the grid, shifting ends with them
// (ppo_policy/utils.py:78-89 intent, endpoint-inclusive grid).
void rlmg_quantize(int32_t* start, int32_t* end, int64_t n, int32_t ticks) {
  for (int64_t i = 0; i < n; ++i) {
    int32_t s = start[i];
    int32_t lo = (s / ticks) * ticks;
    int32_t hi = lo + ticks;
    int32_t snapped = (s - lo <= hi - s) ? lo : hi;
    int32_t shift = snapped - s;
    start[i] += shift;
    end[i] += shift;
  }
}

// Encode quantized notes into 6-field tuple-event word rows.
//
// Inputs: notes sorted by (start, pitch); tempo curve sampled per beat
// (beat_bpm[i] = BPM at tick i*480, n_beats entries).  Emits one row per
// note: [tempo_id, bar_in_chunk(-1), pos_id, pitch_id, dur_id, vel_id] and
// bar_index[i] = absolute bar number — the fused equivalent of
// item2event (prepare_data.py:97-174) + convert_to_tuple_events (:26-95) +
// tuple_event_to_word (:318-340) for the note/tempo event stream.
void rlmg_encode_tuple(const int32_t* start, const int32_t* end,
                       const int16_t* pitch, const int16_t* vel, int64_t n,
                       const double* beat_bpm, int64_t n_beats,
                       int32_t* words /* n x 6 */, int32_t* bar_index) {
  const int bar_ticks = 1920;
  const int beat_ticks = 480;
  for (int64_t i = 0; i < n; ++i) {
    int64_t bar = start[i] / bar_ticks;
    // position: argmin |bar_st + j*120 - start| over j in [0,16)
    double off = double(start[i] - bar * bar_ticks);
    int pos = int(std::lround(off / 120.0));
    pos = std::min(std::max(pos, 0), 15);
    // velocity: searchsorted(linspace(0,128,33), v, 'right') - 1, clip 21
    int v = vel[i];
    int vel_idx = std::min(v / 4, 21);        // bins are exactly width 4
    if (vel_idx < 0) vel_idx = 0;
    // duration: argmin |60*k - dur| for k in [1,64] -> id k-1, clip 63
    int dur = end[i] - start[i];
    int k = int(std::lround(double(dur) / 60.0));
    k = std::min(std::max(k, 1), 64);
    int dur_idx = k - 1;
    // pitch: 22..107 -> id 0..85
    int p = std::min(std::max(int(pitch[i]), 22), 107) - 22;
    // tempo: BPM at the current beat, class-resolved like item2event then
    // quantized to step 4: id = (bpm_q - 28) / 4
    int64_t beat = std::min(int64_t(start[i] / beat_ticks), n_beats - 1);
    double bpm_raw = n_beats > 0 ? beat_bpm[beat] : 120.0;
    int bpm = int(bpm_raw);
    if (bpm < 30) bpm = 30;                   // slow-class floor
    else if (bpm >= 210) bpm = 209;           // fast-class ceiling
    int bpm_q = bpm - (bpm % 4);
    int tempo_id = std::min(std::max((bpm_q - 28) / 4, 0), 45);

    words[i * 6 + 0] = tempo_id;
    words[i * 6 + 1] = -1;
    words[i * 6 + 2] = pos;
    words[i * 6 + 3] = p;
    words[i * 6 + 4] = dur_idx;
    words[i * 6 + 5] = vel_idx;
    bar_index[i] = int32_t(bar);
  }
}

}  // extern "C"
