"""On-chip regression gates for the v7 weight-resident LATENCY decode path.

Same structure as tests/test_persistent_decode_tpu.py (the v6 gates): the
v7 kernel has DMA/semaphore machinery that only a real TPU executes
natively, so this test spawns a clean subprocess (no platform pin) and
asserts the contracts a state-handoff or layout regression would break:

1. chunk invariance of generate_tokens_latency (exact, greedy);
2. teacher-forced per-step argmax agreement vs the XLA decode_step
   (>= 95%; bf16 MXU rounding forbids exactness — decode_kernel_v7
   numerics note);
3. packed-state parity after teacher forcing (tolerance).

Skips cleanly when no TPU backend is reachable.
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import json, os, sys
os.environ.pop("XLA_FLAGS", None)
os.environ["RLMG_ATTN_BACKEND"] = "xla"
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(%(repo)r, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if jax.default_backend() not in ("tpu", "axon"):
    print(json.dumps({"skip": jax.default_backend()})); sys.exit(0)
import jax.numpy as jnp
import numpy as np
from reinforcement_learning_in_music_generation_tpu import config as C
from reinforcement_learning_in_music_generation_tpu.generate import sampler
from reinforcement_learning_in_music_generation_tpu.models import (
    common as cm, linear_transformer as lt)
from reinforcement_learning_in_music_generation_tpu.ops import sampling as smp
from reinforcement_learning_in_music_generation_tpu.ops.experimental import (
    decode_kernel_v7 as dk7)

out = {"backend": jax.default_backend()}
cfg = C.agent_config()
params = lt.init_params(jax.random.PRNGKey(0), cfg)
params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
rng = np.random.default_rng(0)

# ---- 1. chunk invariance of the production wrapper (exact) ----
b, t0, T = 8, 3, 40
seed_tok = np.stack([rng.integers(0, v, size=(b, t0))
                     for v in cfg.vocab_sizes], axis=-1).astype(np.int32)
seed_tok[:, 0, :] = np.asarray(sampler.CP_SEED)
seed_tok = jnp.asarray(seed_tok)
kw = dict(max_tokens=T, greedy=True, settings=tuple(smp.GREEDY))
res_a = sampler.generate_tokens_latency(
    params, cfg, jax.random.PRNGKey(1), seed_tok, chunk=40, **kw)
res_b = sampler.generate_tokens_latency(
    params, cfg, jax.random.PRNGKey(1), seed_tok, chunk=8, **kw)
out["chunk_invariance_mism"] = int(
    (np.asarray(res_a.tokens) != np.asarray(res_b.tokens)).sum())

# ---- 2+3. teacher-forced kernel-vs-XLA agreement + state parity ----
bK, TK = 8, 24
toks = np.stack([rng.integers(0, v, size=(TK, bK))
                 for v in cfg.vocab_sizes], axis=-1).astype(np.int32)
toks = jnp.asarray(toks)
pe = cm.sinusoidal_table(cfg.max_len, cfg.d_model, jnp.float32)
dtype = params["in_linear"]["w"].dtype
v7p = dk7.make_v7_params(params, cfg, pe, dtype=dtype)
settings = tuple(smp.GREEDY)
temps = tuple(s.temperature for s in settings)
topps = tuple(s.top_p if s.top_p is not None else float("inf")
              for s in settings)
step1 = jax.jit(lambda tokT, s4, z4, t: dk7.fused_decode_v7(
    v7p, tokT, s4, z4, t, jnp.asarray(0, jnp.int32), n_head=cfg.n_head,
    max_tokens=1, vocab_sizes=cfg.vocab_sizes, temps=temps, topps=topps,
    greedy=True, eps=cfg.attn_eps))

state = lt.init_decode_state(cfg, bK)
s4, z4 = dk7.pack_state_pair(state.s, state.z)
st = state
agree, total = 0, 0
xla_step = jax.jit(lambda tok, st: lt.decode_step(
    params, cfg, tok, st, pe_table=pe))
for t in range(TK):
    outT, s4, z4 = step1(toks[t].T, s4, z4, jnp.asarray(t, jnp.int32))
    h, st = xla_step(toks[t], st)
    logits = lt.forward_output(params, cfg, h)
    ref_tok = np.stack(
        [np.asarray(jnp.argmax(l, -1)) for l in logits], 0)   # (nf, b)
    agree += int((np.asarray(outT[0]) == ref_tok).sum())
    total += ref_tok.size
out["tf_agreement"] = agree / total

sx, zx = dk7.pack_state_pair(st.s.astype(jnp.float32),
                             st.z.astype(jnp.float32))
rel = (np.abs(np.asarray(s4, np.float32) - np.asarray(sx))
       / (np.abs(np.asarray(sx)) + 1e-2))
out["state_rel_p90"] = float(np.percentile(rel, 90))
print(json.dumps(out))
""" % {"repo": _REPO}


@pytest.mark.slow
def test_latency_decode_contracts_on_tpu():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("RLMG_LATENCY_DECODE", None)
    env.pop("RLMG_DECODE_STATE_DTYPE", None)
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, env=env, cwd=_REPO,
            timeout=int(os.environ.get("RLMG_TPU_PROBE_TIMEOUT", "240")))
    except subprocess.TimeoutExpired:
        pytest.skip("accelerator backend init hung (tunnel outage)")
    if probe.returncode != 0:
        pytest.skip("accelerator backend init failed (no TPU)")
    p = subprocess.run([sys.executable, "-c", _SCRIPT], capture_output=True,
                       text=True, env=env, cwd=_REPO,
                       timeout=int(os.environ.get("RLMG_TPU_TEST_TIMEOUT",
                                                  "3600")))
    assert p.returncode == 0, f"subprocess failed:\n{p.stdout}\n{p.stderr}"
    line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    if "skip" in out:
        pytest.skip(f"no TPU backend in subprocess (got {out['skip']})")
    assert out["chunk_invariance_mism"] == 0, out
    assert out["tf_agreement"] >= 0.95, out
    assert out["state_rel_p90"] < 0.05, out
