"""Torch<->JAX weight-port parity (VERDICT r1, Missing #2).

Ports the weights of ``bench_baseline_torch.RecurrentLinearTransformer``
(the in-repo torch recreation of the reference's flagship decode model,
/root/reference/dqn_policy/model.py:97-298) into the JAX model and asserts:

  (a) hidden states and per-field logits match <= 1e-4 over a random CP
      token sequence, in BOTH parallel (forward_hidden) and recurrent
      (decode_step) modes;
  (b) greedy token streams are identical for >= 256 steps;
  (c) write_midi_cp output bytes are identical for the two streams.

This is the achievable form of BASELINE.md's "byte-identical decode"
north star (the reference's released Pop1K7 weights are unavailable, so
parity is shown on ported random-init weights instead).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench_baseline_torch as bt  # noqa: E402


pytestmark = pytest.mark.slow  # deep parity sweep (~80s CPU); run with -m "" or -m slow

from reinforcement_learning_in_music_generation_tpu import config as C  # noqa: E402
from reinforcement_learning_in_music_generation_tpu.models import (  # noqa: E402
    common as cm, linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.data import (  # noqa: E402
    tokenizer)

N_STEPS = 256


def port_torch_weights(model: "bt.RecurrentLinearTransformer") -> dict:
    """torch state -> JAX param pytree. torch nn.Linear stores (out, in);
    the JAX layout is w (in, out). Per-layer tensors stack to (L, ...)."""
    def t(x):
        return jnp.asarray(x.detach().numpy())

    names = cm.field_names(len(bt.N_CLASS))
    params = {
        "emb": {n: t(e.weight) for n, e in zip(names, model.embs)},
        "in_linear": {"w": t(model.in_linear.weight).T,
                      "b": t(model.in_linear.bias)},
        "final_ln": {"scale": t(model.final_ln.weight),
                     "bias": t(model.final_ln.bias)},
        "heads": {n: {"w": t(h.weight).T, "b": t(h.bias)}
                  for n, h in zip(names, model.heads)},
    }
    layers = {}
    for key in ("wq", "wk", "wv", "wo", "ffn1", "ffn2"):
        layers[key] = {
            "w": jnp.stack([t(lp[key].weight).T for lp in model.layers]),
            "b": jnp.stack([t(lp[key].bias) for lp in model.layers]),
        }
    for key in ("ln1", "ln2"):
        layers[key] = {
            "scale": jnp.stack([t(lp[key].weight) for lp in model.layers]),
            "bias": jnp.stack([t(lp[key].bias) for lp in model.layers]),
        }
    params["layers"] = layers
    return params


@pytest.fixture(scope="module")
def ported():
    torch.manual_seed(0)
    model = bt.RecurrentLinearTransformer().eval()
    cfg = C.agent_config()
    params = port_torch_weights(model)
    return model, cfg, params


def torch_hidden_seq(model, tokens: np.ndarray):
    """Run the torch recurrent model over tokens (T, 6); return the
    (T, D) post-final-LN hidden states."""
    dh = bt.D_MODEL // bt.N_HEAD
    memory = [(torch.zeros(bt.N_HEAD, dh, dh), torch.zeros(bt.N_HEAD, dh))
              for _ in range(bt.N_LAYER)]
    hs = []
    with torch.no_grad():
        for pos, tok in enumerate(tokens):
            h, memory = model.step(torch.tensor(tok), memory, pos)
            hs.append(h.numpy())
    return np.stack(hs)


def test_hidden_and_logits_parity(ported):
    model, cfg, params = ported
    rng = np.random.default_rng(7)
    T = 32
    tokens = np.stack([rng.integers(0, v, T) for v in bt.N_CLASS],
                      axis=-1).astype(np.int32)

    th = torch_hidden_seq(model, tokens)                       # (T, D)

    x = jnp.asarray(tokens)[None]                              # (1, T, 6)
    jh_par = np.asarray(lt.forward_hidden(params, cfg, x))[0]  # parallel

    # recurrent mode
    state = lt.init_decode_state(cfg, 1)
    jh_rec = []
    step = jax.jit(lambda tok, st: lt.decode_step(params, cfg, tok, st))
    for tok in tokens:
        h, state = step(jnp.asarray(tok)[None], state)
        jh_rec.append(np.asarray(h)[0])
    jh_rec = np.stack(jh_rec)

    assert np.max(np.abs(jh_par - th)) <= 1e-4, \
        f"parallel hidden mismatch {np.max(np.abs(jh_par - th))}"
    assert np.max(np.abs(jh_rec - th)) <= 1e-4, \
        f"recurrent hidden mismatch {np.max(np.abs(jh_rec - th))}"

    # logits on the last position, all six heads
    with torch.no_grad():
        tl = [head(torch.tensor(th[-1])).numpy() for head in model.heads]
    jl = lt.forward_output(params, cfg, jnp.asarray(jh_par[-1]))
    for a, b in zip(tl, jl):
        assert np.max(np.abs(np.asarray(b) - a)) <= 1e-4


def greedy_torch(model, n_steps: int) -> np.ndarray:
    dh = bt.D_MODEL // bt.N_HEAD
    memory = [(torch.zeros(bt.N_HEAD, dh, dh), torch.zeros(bt.N_HEAD, dh))
              for _ in range(bt.N_LAYER)]
    token = torch.tensor([0, 0, 1, 0, 0, 0])
    out = []
    with torch.no_grad():
        for pos in range(n_steps):
            h, memory = model.step(token, memory, pos)
            token = torch.tensor([int(torch.argmax(head(h)))
                                  for head in model.heads])
            out.append(token.numpy())
    return np.stack(out)


def greedy_jax(params, cfg, n_steps: int) -> np.ndarray:
    tok0 = jnp.array([[0, 0, 1, 0, 0, 0]], jnp.int32)
    state = lt.init_decode_state(cfg, 1)

    def one(carry, _):
        token, st = carry
        h, st = lt.decode_step(params, cfg, token, st)
        logits = lt.forward_output(params, cfg, h)
        nxt = jnp.stack([jnp.argmax(l, axis=-1) for l in logits],
                        axis=-1).astype(jnp.int32)
        return (nxt, st), nxt

    (_, _), toks = jax.lax.scan(one, (tok0, state), None, length=n_steps)
    return np.asarray(toks)[:, 0, :]


def test_greedy_stream_and_midi_bytes_identical(ported, tmp_path):
    model, cfg, params = ported
    t_stream = greedy_torch(model, N_STEPS)
    j_stream = greedy_jax(params, cfg, N_STEPS)
    mismatch = np.nonzero((t_stream != j_stream).any(axis=1))[0]
    assert mismatch.size == 0, \
        f"greedy streams diverge at step {mismatch[0] if mismatch.size else -1}"

    # (c) identical MIDI bytes from the two streams
    _, w2e = tokenizer.drop_type(tokenizer.construct_cp_dict())
    pa, pb = tmp_path / "torch.mid", tmp_path / "jax.mid"
    tokenizer.write_midi_cp(t_stream, str(pa), w2e)
    tokenizer.write_midi_cp(j_stream, str(pb), w2e)
    assert pa.read_bytes() == pb.read_bytes()
