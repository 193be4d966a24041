"""Runtime performance stats — the reference's `runtime_stats.json` contract
(dqn_policy/testing-no-type-cp.py:213-224, agent_pretrain.py:692-703), plus
jax.profiler trace hooks."""

from __future__ import annotations

import contextlib
import json
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
