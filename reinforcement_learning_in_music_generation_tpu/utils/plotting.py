"""Loss/score plots.

Provides the plot helpers the reference imports but never defines
(`bi_loss_plot`, `tri_loss_plot`, `score_plotting` — dqn_policy/
IRL_dqn_train.py:21, AIRL.py:15; SURVEY §2.6#2), plus the generic loss
curve (saving.py:243-289 make_loss_report).
"""

from __future__ import annotations

import collections
from typing import Sequence


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def bi_loss_plot(first: Sequence[float], second: Sequence[float],
                 third: Sequence[float], names: Sequence[str],
                 path: str) -> None:
    """Three-series loss plot (MSE / CE / global) — IRL_dqn_train.py:373-378."""
    plt = _plt()
    fig = plt.figure(dpi=100)
    for series, name in zip((first, second, third), names):
        plt.plot(series, label=name)
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.legend(loc="upper right")
    plt.tight_layout()
    plt.savefig(path)
    plt.close(fig)


def tri_loss_plot(expert: Sequence[float], agent: Sequence[float],
                  ce: Sequence[float], total: Sequence[float],
                  names: Sequence[str], path: str) -> None:
    """Discriminator losses (Expert/Agent/CE/Total) — AIRL.py:219-223."""
    plt = _plt()
    fig = plt.figure(dpi=100)
    for series, name in zip((expert, agent, ce, total), names):
        plt.plot(series, label=name)
    plt.xlabel("Update")
    plt.ylabel("Loss")
    plt.legend(loc="upper right")
    plt.tight_layout()
    plt.savefig(path)
    plt.close(fig)


def curve_plot(series: dict, path: str, *, xlabel: str = "Epoch",
               ylabel: str = "Value") -> None:
    """N named series over epochs (learning-effect curves: discriminator
    score separation, PPO mean reward — the rebuild's analog of the
    reference's wandb panels, IRL_dqn_train.py:393-401,
    ppo_train.py:516-527)."""
    plt = _plt()
    fig = plt.figure(dpi=100)
    for name, ys in series.items():
        plt.plot(ys, label=name)
    plt.xlabel(xlabel)
    plt.ylabel(ylabel)
    plt.legend(loc="best")
    plt.tight_layout()
    plt.savefig(path)
    plt.close(fig)


def score_plotting(agent_scores: Sequence[float], expert_scores: Sequence[float],
                   path: str) -> None:
    """Agent-vs-expert reward histogram — AIRL.py:225-228."""
    plt = _plt()
    fig = plt.figure(dpi=100)
    plt.hist(agent_scores, bins=50, alpha=0.6, label="Agent")
    plt.hist(expert_scores, bins=50, alpha=0.6, label="Expert")
    plt.xlabel("Discriminator score")
    plt.ylabel("Count")
    plt.legend(loc="upper right")
    plt.tight_layout()
    plt.savefig(path)
    plt.close(fig)


def make_loss_report(path_logfile: str, path_figure: str = "loss.png",
                     dpi: int = 100) -> None:
    """Train/valid loss curves from a Saver logfile (saving.py:254-289)."""
    monitor = collections.defaultdict(list)
    with open(path_logfile) as f:
        for line in f:
            try:
                key, val, step, acc_time = line.strip().split(" | ")
                monitor[key.strip()].append((float(val), int(step)))
            except ValueError:
                continue
    plt = _plt()
    fig = plt.figure(dpi=dpi)
    plt.title("training process")
    for key in ("train loss", "valid loss", "epoch loss", "batch loss"):
        if monitor[key]:
            steps = [s for _, s in monitor[key]]
            vals = [v for v, _ in monitor[key]]
            plt.plot(steps, vals, label=key)
    plt.yscale("log")
    plt.legend(loc="upper right")
    plt.tight_layout()
    plt.savefig(path_figure)
    plt.close(fig)
