"""End-to-end regression gates for the PRODUCTION decode path.

`use_persistent_decode()` routes generate_songs through the v6 persistent
Pallas kernel on TPU, but that kernel has no interpret mode, so the rest
of the suite (pinned to the virtual CPU mesh by conftest.py) can never
execute it.  This test spawns a clean subprocess (no platform pin) and,
if a real TPU is reachable, asserts the three contracts that a chunk/
state/seed-handoff regression would break:

1. **Chunk invariance (exact).**  generate_tokens_persistent with
   chunk=8 must produce the IDENTICAL greedy stream as chunk=40: the
   chunk size only changes where the host slices the loop, so any
   difference is a state-handoff bug.  Per-song distinct random seeds so
   a batch-lane permutation cannot hide (every pre-r3 check used
   identical songs across lanes, which masks exactly that class of bug).

2. **Teacher-forced argmax agreement (>= 95%).**  Feeding the SAME token
   stream through the v6 kernel and the XLA decode_step, the per-step
   greedy tokens must agree almost everywhere (measured: 98.4% with bf16
   weights, 99.7% with f32).  They cannot agree exactly: TPU matmuls
   round f32 inputs to bf16 on the MXU, and the transposed network
   rounds differently than XLA's batch-major layout (~0.3% median
   relative activation difference, measured r3) — so autoregressive
   greedy streams diverge at near-ties after a few dozen tokens and
   exact-stream equality is NOT the kernel's contract
   (decode_kernel_v6.py docstring).  A layout bug (lane permutation,
   pe off-by-one, state transpose) drops agreement to ~1%, far below
   the gate.

3. **Seed-handoff state parity (tolerance).**  The packed state after
   XLA teacher-forced seeding must match the kernel's own state after
   feeding the same tokens, to matmul-rounding tolerance.

Skips cleanly when no TPU backend is available (e.g. plain CI hosts).
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
from reinforcement_learning_in_music_generation_tpu.ops import (
    decode_kernel_v6 as dk6, sampling as smp)

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
res_a = sampler.generate_tokens_persistent(
    params, cfg, jax.random.PRNGKey(1), seed_tok, chunk=40, **kw)
res_b = sampler.generate_tokens_persistent(
    params, cfg, jax.random.PRNGKey(1), seed_tok, chunk=8, **kw)
out["chunk_invariance_mism"] = int(
    (np.asarray(res_a.tokens) != np.asarray(res_b.tokens)).sum())

# ---- 2+3. teacher-forced kernel-vs-XLA agreement + state parity ----
bK, TK = 128, 24
toks = np.stack([rng.integers(0, v, size=(TK, bK))
                 for v in cfg.vocab_sizes], axis=-1).astype(np.int32)
toks = jnp.asarray(toks)
pe = cm.sinusoidal_table(cfg.max_len, cfg.d_model, jnp.float32)
dtype = params["in_linear"]["w"].dtype
v6p = dk6.make_v6_params(params, cfg, pe, dtype=dtype)
settings = tuple(smp.GREEDY)
temps = tuple(s.temperature for s in settings)
topps = tuple(s.top_p if s.top_p is not None else float("inf")
              for s in settings)
step1 = jax.jit(lambda tokT, s6, z6, t: dk6.fused_decode_v6(
    v6p, tokT, s6, z6, t, jnp.asarray(0, jnp.int32), n_head=cfg.n_head,
    max_tokens=1, vocab_sizes=cfg.vocab_sizes, temps=temps, topps=topps,
    greedy=True, eps=cfg.attn_eps))

state = lt.init_decode_state(cfg, bK)
s6, z6 = dk6.pack_state_v6(state.s, state.z)
st = state
agree, total = 0, 0
xla_step = jax.jit(lambda tok, st: lt.decode_step(
    params, cfg, tok, st, pe_table=pe))
for t in range(TK):
    outT, s6, z6 = step1(toks[t].T, s6, z6, jnp.asarray(t, jnp.int32))
    h, st = xla_step(toks[t], st)
    logits = lt.forward_output(params, cfg, h)
    ref_tok = np.stack(
        [np.asarray(jnp.argmax(l, -1)) for l in logits], 0)   # (nf, b)
    agree += int((np.asarray(outT[0]) == ref_tok).sum())
    total += ref_tok.size
out["tf_agreement"] = agree / total

sx, zx = dk6.pack_state_v6(st.s.astype(jnp.float32), st.z.astype(jnp.float32))
rel = (np.abs(np.asarray(s6, np.float32) - np.asarray(sx))
       / (np.abs(np.asarray(sx)) + 1e-2))
out["state_rel_p90"] = float(np.percentile(rel, 90))
print(json.dumps(out))
""" % {"repo": _REPO}


@pytest.mark.slow
def test_persistent_decode_contracts_on_tpu():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("RLMG_PERSISTENT_DECODE", None)
    env.pop("RLMG_DECODE_STATE_DTYPE", None)
    # Outage probe first: during a tunnel outage, backend INIT hangs
    # (it does not fail), so without this the main subprocess would sit
    # for the full 3600s timeout and report an error instead of a skip
    # (the exact failure mode of MULTICHIP_r03, VERDICT r3 #1).
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, env=env, cwd=_REPO,
            timeout=int(os.environ.get("RLMG_TPU_PROBE_TIMEOUT", "240")))
    except subprocess.TimeoutExpired:
        pytest.skip("accelerator backend init hung (tunnel outage)")
    if probe.returncode != 0:
        pytest.skip("accelerator backend init failed (no TPU)")
    # generous: the tunneled remote compile helper has been observed to
    # take 25+ minutes per cold program under load; warm-cache runs take
    # ~2 min (the persistent jax cache under .jax_cache makes reruns fast)
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
