"""Experiment logging — the reference's `Saver` contract.

Reproduces dqn_policy/saving.py:158-241 (the live, second definition):
`exp_dir/log.txt` lines of `key | val | step | time`, a global step counter,
and model save/load — plus a metrics fan-out bus that unifies the
reference's four overlapping logging paths (Saver/wandb/matplotlib/pickles,
SURVEY §5 'Metrics').
"""

from __future__ import annotations

import os
import time
from typing import Callable, List, Optional


class Saver:
    """Logfile-format-compatible Saver (dqn_policy/saving.py:158-241)."""

    def __init__(self, exp_dir: str, mode: str = "w"):
        self.exp_dir = exp_dir
        self.init_time = time.time()
        self.global_step = 0
        os.makedirs(exp_dir, exist_ok=True)
        self._path = os.path.join(exp_dir, "log.txt")
        self._fh = open(self._path, mode)

    def add_summary_msg(self, msg: str) -> None:
        self._fh.write(f"{msg}\n")
        self._fh.flush()

    def add_summary(self, key: str, val, step: Optional[int] = None,
                    cur_time: Optional[float] = None) -> None:
        if cur_time is None:
            cur_time = time.time() - self.init_time
        if step is None:
            step = self.global_step
        if isinstance(val, float):
            msg = f"{key:10s} | {val:.10f} | {step:10d} | {cur_time}"
        else:
            msg = f"{key:10s} | {val} | {step:10d} | {cur_time}"
        self._fh.write(msg + "\n")
        self._fh.flush()

    def global_step_increment(self) -> None:
        self.global_step += 1

    def save_model(self, params, outdir: Optional[str] = None,
                   name: str = "model") -> str:
        from .checkpoint import save_checkpoint
        outdir = outdir or self.exp_dir
        path = os.path.join(outdir, name + "_params.ckpt")
        save_checkpoint(path, params)
        return path

    def load_model(self, path_exp: str, name: str = "model_params.ckpt"):
        from .checkpoint import load_checkpoint
        return load_checkpoint(os.path.join(path_exp, name))

    def close(self) -> None:
        self._fh.close()


class MetricsBus:
    """Single metrics bus fanning out to sinks (logfile / wandb-if-present /
    in-memory history for plotting) — replaces the reference's four parallel
    logging mechanisms."""

    def __init__(self, saver: Optional[Saver] = None, use_wandb: bool = False,
                 wandb_project: str = "rlmg-tpu", wandb_config: dict | None = None):
        self.saver = saver
        self.history: dict = {}
        self._sinks: List[Callable[[dict, int], None]] = []
        self._wandb = None
        if use_wandb:
            try:  # wandb is optional; absent in this environment
                import wandb
                self._wandb = wandb
                wandb.init(project=wandb_project, config=wandb_config or {})
            except Exception:
                self._wandb = None

    def add_sink(self, fn: Callable[[dict, int], None]) -> None:
        self._sinks.append(fn)

    def log(self, metrics: dict, step: Optional[int] = None) -> None:
        step = step if step is not None else (
            self.saver.global_step if self.saver else len(self.history.get("_steps", [])))
        self.history.setdefault("_steps", []).append(step)
        for k, v in metrics.items():
            v = float(v)
            self.history.setdefault(k, []).append(v)
            if self.saver is not None:
                self.saver.add_summary(k, v, step=step)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        for sink in self._sinks:
            sink(metrics, step)

    def save_file(self, path: str) -> None:
        """Upload an artifact (checkpoint) to wandb if a run is live —
        the reference wandb.save()s its best DQN checkpoint
        (dqn_policy/IRL_dqn_train.py:370) and AIRL disc ckpt (AIRL.py:191).
        No-op without wandb."""
        if self._wandb is not None:
            try:
                self._wandb.save(path)
            except Exception:
                pass


def loss_bucket_filename(loss: float) -> Optional[str]:
    """Loss-bucketed checkpoint names (agent_pretrain.py:594-632):
    0.4<l<=0.8 -> trainloss_<int(l*10)*10>; 0.05<l<=0.4 -> trainloss_<int(l*100)>;
    l<=0.05 -> None (early stop); else trainloss_<int(l*100)>_high."""
    if 0.4 < loss <= 0.8:
        return f"trainloss_{int(loss * 10) * 10}"
    if 0.05 < loss <= 0.40:
        return f"trainloss_{int(loss * 100)}"
    if loss <= 0.05:
        return None
    return f"trainloss_{int(loss * 100)}_high"
