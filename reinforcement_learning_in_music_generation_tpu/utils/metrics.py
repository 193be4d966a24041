"""Runtime performance stats — the reference's `runtime_stats.json` contract
(dqn_policy/testing-no-type-cp.py:213-224, agent_pretrain.py:692-703), plus
jax.profiler trace hooks."""

from __future__ import annotations

import contextlib
import json
import os
from typing import List, Optional


class RuntimeStats:
    """Collects per-song generation timings and writes runtime_stats.json
    with the same keys as the reference ('ave token time:' = tokens/sec)."""

    def __init__(self):
        self.song_time: List[float] = []
        self.words_len: List[int] = []

    def add_song(self, seconds: float, n_tokens: int) -> None:
        self.song_time.append(float(seconds))
        self.words_len.append(int(n_tokens))

    @property
    def tokens_per_sec(self) -> float:
        total = sum(self.song_time)
        return sum(self.words_len) / total if total > 0 else 0.0

    @property
    def ave_song_time(self) -> float:
        return sum(self.song_time) / len(self.song_time) if self.song_time else 0.0

    def dump(self, path: str = "runtime_stats.json") -> dict:
        result = {
            "song_time": self.song_time,
            "words_len_list": self.words_len,
            "ave token time:": self.tokens_per_sec,
            "ave song time": self.ave_song_time,
        }
        with open(path, "w") as f:
            json.dump(result, f)
        return result


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace around a region (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_trace(log_dir: str, top: int = 20, steps: int = 1):
    """Device-time breakdown from a `profile_trace` capture.

    Parses the newest trace.json.gz under `log_dir` and aggregates device
    op durations by op *kind* (fusion indices stripped), returning
    [(kind, us_per_step, count_per_step)] sorted by time.  This is the
    analysis that found the scan-backward dynamic-update-slice / remat tax
    behind the round-2 scan_unroll win (BENCH.md) — no TensorBoard needed.
    """
    import collections
    import glob
    import gzip
    import re

    paths = sorted(glob.glob(os.path.join(
        log_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    evs = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "")
            for e in evs if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pids.items() if "TPU" in n or "GPU" in n}
    if not device_pids:          # CPU-only capture: fall back to host rows
        device_pids = set(pids)
    by_kind = collections.Counter()
    counts = collections.Counter()
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e["name"]
        if name.startswith("jit_") or name.isdigit():
            continue  # whole-program envelopes
        kind = re.sub(r"[.\d]+", "", name) or name
        by_kind[kind] += e.get("dur", 0)
        counts[kind] += 1
    return [(k, us / max(steps, 1), counts[k] / max(steps, 1))
            for k, us in by_kind.most_common(top)]
