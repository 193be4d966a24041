"""PyTorch-CPU baseline: the reference's generation hot path, measured.

Re-creates the testing-no-type-cp.py decode configuration — a 12-layer
d=512 causal-linear transformer in recurrent mode, one song at a time, one
token per step, with the reference's host-side numpy sampling
(dqn_policy/model.py:19-55, 259-298) — on CPU torch, and measures
generated tokens/sec.  The result is cached to .baseline_torch.json and
used as `vs_baseline` in bench.py (BASELINE.md: target >= 10x this).
"""

import json
import math
import os
import time

import numpy as np
import torch
import torch.nn as nn

N_CLASS = [56, 135, 18, 87, 18, 25]
EMB_SIZES = [128, 256, 64, 512, 128, 128]
D_MODEL, N_LAYER, N_HEAD, D_INNER = 512, 12, 8, 2048
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".baseline_torch.json")


def softmax_with_temperature(logits, temperature):
    probs = np.exp(logits / temperature) / np.sum(np.exp(logits / temperature))
    return probs


def nucleus(probs, p):
    probs /= (sum(probs) + 1e-5)
    sorted_probs = np.sort(probs)[::-1]
    sorted_index = np.argsort(probs)[::-1]
    cusum = np.cumsum(sorted_probs)
    after = cusum > p
    if sum(after) > 0:
        last = np.where(after)[0][0] + 1
        candi = sorted_index[:last]
    else:
        candi = sorted_index[:]
    cp = np.array([probs[i] for i in candi])
    cp /= cp.sum()
    return np.random.choice(candi, size=1, p=cp)[0]


def sampling(logit, p=None, t=1.0):
    logit = logit.squeeze().cpu().numpy().astype(np.float64)
    logit = logit - logit.max()          # keep the exp finite on random weights
    probs = softmax_with_temperature(logit, t)
    if p is not None:
        return nucleus(probs, p)
    sorted_probs = np.sort(probs)[::-1]
    sorted_index = np.argsort(probs)[::-1]
    return np.random.choice(sorted_index, size=1, p=sorted_probs / sorted_probs.sum())[0]


class RecurrentLinearTransformer(nn.Module):
    """Recurrent-mode causal linear attention stack (fast_transformers
    RecurrentEncoderBuilder equivalent), CPU."""

    def __init__(self):
        super().__init__()
        self.embs = nn.ModuleList(
            [nn.Embedding(n, e) for n, e in zip(N_CLASS, EMB_SIZES)])
        self.in_linear = nn.Linear(sum(EMB_SIZES), D_MODEL)
        self.layers = nn.ModuleList()
        for _ in range(N_LAYER):
            self.layers.append(nn.ModuleDict({
                "wq": nn.Linear(D_MODEL, D_MODEL),
                "wk": nn.Linear(D_MODEL, D_MODEL),
                "wv": nn.Linear(D_MODEL, D_MODEL),
                "wo": nn.Linear(D_MODEL, D_MODEL),
                "ln1": nn.LayerNorm(D_MODEL),
                "ln2": nn.LayerNorm(D_MODEL),
                "ffn1": nn.Linear(D_MODEL, D_INNER),
                "ffn2": nn.Linear(D_INNER, D_MODEL),
            }))
        self.final_ln = nn.LayerNorm(D_MODEL)
        self.heads = nn.ModuleList([nn.Linear(D_MODEL, n) for n in N_CLASS])
        # sinusoidal table
        pe = torch.zeros(4096, D_MODEL)
        pos = torch.arange(0, 4096).float().unsqueeze(1)
        div = torch.exp(torch.arange(0, D_MODEL, 2).float()
                        * (-math.log(10000.0) / D_MODEL))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe)

    @staticmethod
    def phi(x):
        return torch.where(x > 0, x + 1.0, torch.exp(torch.clamp(x, max=0.0)))

    def step(self, token, memory, pos):
        dh = D_MODEL // N_HEAD
        h = torch.cat([emb(token[i]) * math.sqrt(emb.embedding_dim)
                       for i, emb in enumerate(self.embs)], dim=-1)
        h = self.in_linear(h) + self.pe[pos]
        new_memory = []
        for li, lp in enumerate(self.layers):
            s, z = memory[li]
            q = self.phi(lp["wq"](h).view(N_HEAD, dh))
            k = self.phi(lp["wk"](h).view(N_HEAD, dh))
            v = lp["wv"](h).view(N_HEAD, dh)
            s = s + k.unsqueeze(-1) * v.unsqueeze(-2)
            z = z + k
            num = torch.einsum("he,hef->hf", q, s)
            den = torch.einsum("he,he->h", q, z) + 1e-6
            att = (num / den.unsqueeze(-1)).reshape(D_MODEL)
            h = lp["ln1"](h + lp["wo"](att))
            y = lp["ffn2"](torch.nn.functional.gelu(lp["ffn1"](h)))
            h = lp["ln2"](h + y)
            new_memory.append((s, z))
        return self.final_ln(h), new_memory


def measure(n_tokens: int = 64) -> float:
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    model = RecurrentLinearTransformer().eval()
    dh = D_MODEL // N_HEAD
    memory = [(torch.zeros(N_HEAD, dh, dh), torch.zeros(N_HEAD, dh))
              for _ in range(N_LAYER)]
    token = torch.tensor([0, 0, 1, 0, 0, 0])
    settings = [(1.2, 0.9), (1.0, 0.99), (1.2, None), (1.0, 0.9),
                (2.0, 0.9), (5.0, None)]
    with torch.no_grad():
        # warmup
        h, memory = model.step(token, memory, 0)
        t0 = time.time()
        for pos in range(1, n_tokens + 1):
            words = []
            for head, (t, p) in zip(model.heads, settings):
                words.append(int(sampling(head(h), p=p, t=t)))
            token = torch.tensor(words)
            h, memory = model.step(token, memory, pos)
        elapsed = time.time() - t0
    return n_tokens / elapsed


def get_baseline(force: bool = False) -> float:
    if not force and os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["decode_tokens_per_sec"]
    tps = measure()
    with open(CACHE, "w") as f:
        json.dump({"decode_tokens_per_sec": tps,
                   "config": "12L d512 CP linear-transformer, recurrent, "
                             "1 song, host numpy sampling (torch CPU)"}, f)
    return tps


if __name__ == "__main__":
    print(json.dumps({"decode_tokens_per_sec": get_baseline(force=True)}))
