"""Autoregressive generation: the whole decode loop in one XLA program.

The reference generates one token at a time with a device->host round trip
per token (GPU logits -> numpy softmax/sort -> np.random.choice -> back to
GPU; dqn_policy/testing-no-type-cp.py:126-179 + model.py:259-298) and one
song at a time.  Here the loop is a `lax.scan` over the recurrent O(1)
decode state, batched over songs, with on-device per-field sampling
(ops/sampling.py), so decode speed is bounded by TPU step latency instead
of PCIe+numpy.

Stop conditions:
  * bar count (testing-no-type-cp.py:169-174): a token whose bar-beat field
    decodes to 'Bar' increments the count; a song is done when its count
    reaches `bar_cond` (the final Bar token is kept, matching the
    reference).  The scan runs `max_tokens` steps; finished songs keep
    emitting masked-out padding.
  * fixed token budget (ppo config TOKEN_COUNT, ppo_policy/inference.py).
"""

from __future__ import annotations

import collections
import functools
import os
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import GenerateConfig, LinearTransformerConfig
from ..models import linear_transformer as lt
from ..ops import sampling as smp


class GenResult(NamedTuple):
    tokens: jax.Array     # (B, T, n_fields) int32, including seed tokens
    valid: jax.Array      # (B, T) bool
    n_bars: jax.Array     # (B,) int32


# Default seed: the '[0,0,1,0,0,0]' bar row (testing-no-type-cp.py:135-137)
CP_SEED = (0, 0, 1, 0, 0, 0)


def use_fused_decode() -> bool:
    """The v3 fused decode kernel runs on real TPU backends only (Mosaic);
    RLMG_FUSED_DECODE=0/1 overrides the platform auto-detection."""
    env = os.environ.get("RLMG_FUSED_DECODE")
    if env is not None:
        return env == "1"
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def use_fused_sampling() -> bool:
    """Fused all-fields sampler (ops/sampling.py:sample_fields_fused): one
    padded sort-free chain replaces ~80 small per-field XLA ops in the
    decode loop.  RLMG_FUSED_SAMPLING=0/1 overrides."""
    env = os.environ.get("RLMG_FUSED_SAMPLING")
    if env is not None:
        return env == "1"
    return True


def persistent_min_batch() -> int:
    """Auto-dispatch crossover between the per-step v4 path and the v6
    persistent kernel.  v6 carries batch on the 128-lane axis, so any
    smaller batch pads to 128 lanes and the kernel step costs the same
    ~0.75-1.0 ms regardless of real batch; the v4 per-step path scales
    down.  Measured on v5e (BENCH.md r3): v4 wins through B=64
    (675 vs 744 us/step), v6 wins from B=96 (790 vs 896 us/step).
    RLMG_PERSISTENT_MIN_BATCH overrides."""
    return int(os.environ.get("RLMG_PERSISTENT_MIN_BATCH", "65"))


def use_persistent_decode(batch: Optional[int] = None) -> bool:
    """The v6 persistent whole-sequence kernel (ops/decode_kernel_v6): the
    ENTIRE T-token loop is one pallas_call on the transposed network —
    2.4x the per-step v4 path at batch 512 (BENCH.md).  TPU-only.

    `batch`: when given, auto-dispatch also requires
    batch >= persistent_min_batch() (small batches waste v6's 128 lanes
    and run faster through the per-step v4 path).
    RLMG_PERSISTENT_DECODE=0/1 overrides everything.

    v6 is a THROUGHPUT path: greedy streams diverge from the XLA scan
    path at near-ties (~98.4% per-step agreement), so `generate_songs`
    never auto-dispatches greedy runs here — greedy pins the bit-stable
    XLA path unless RLMG_PERSISTENT_DECODE=1 explicitly opts in."""
    env = os.environ.get("RLMG_PERSISTENT_DECODE")
    if env is not None:
        return env == "1"
    if batch is not None and batch < persistent_min_batch():
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def latency_max_batch() -> int:
    """Largest batch routed to the latency-family kernel —
    `latency_kernel_version()` picks v8 (one grid program per token,
    the default) or v7 (weight-resident chunk), both in
    ops/experimental/.  The family targets the per-token launch +
    weight-stream overhead that binds the v4 per-step path at small
    batch (~184 us of its 284 us/step at B=1, BENCH.md r3 latency
    table).  0 disables the path.

    Default 0 (opt-in): both kernels measured NEGATIVE vs v4 on chip
    (v7 tied, v8 465 us/step at B=1 — BENCH.md r4/r5), and the platform
    lesson is that defaults only claim shapes with a measured win.
    RLMG_LATENCY_MAX_BATCH overrides."""
    return int(os.environ.get("RLMG_LATENCY_MAX_BATCH", "0"))


def use_latency_decode(batch: Optional[int] = None) -> bool:
    """Latency-family kernel auto-dispatch (v8 by default, v7 via
    RLMG_LATENCY_KERNEL — see latency_kernel_version()): TPU, stochastic,
    batch <= latency_max_batch().  RLMG_LATENCY_DECODE=0/1 overrides
    everything.  Like v6 this is a throughput-equivalent stochastic path
    (bf16 MXU rounding), so greedy runs never auto-dispatch here."""
    env = os.environ.get("RLMG_LATENCY_DECODE")
    if env is not None:
        return env == "1"
    if batch is None or batch > latency_max_batch():
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def decode_state_dtype():
    """Storage dtype for the recurrent decode state — shared across ALL
    fused decode paths so the env var cannot mean different things per
    path (ops/decode_common.py; bfloat16 unless RLMG_DECODE_STATE_DTYPE
    overrides)."""
    from ..ops.decode_common import decode_state_dtype as _dsd
    return _dsd()


@functools.lru_cache(maxsize=16)
def _persistent_pack_fn(cfg, dtype_str):
    from ..models import common as cm
    from ..ops import decode_kernel_v6 as dk6

    @jax.jit
    def pack(params):
        pe = cm.sinusoidal_table(cfg.max_len, cfg.d_model, jnp.float32)
        return dk6.make_v6_params(params, cfg, pe,
                                  dtype=jnp.dtype(dtype_str))
    return pack


@functools.lru_cache(maxsize=16)
def _persistent_seed_fn(cfg, dtype_str, state_dtype_str):
    """Teacher-forced seeding through the XLA recurrent path + packing
    into the v6 transposed state layout."""
    from ..models import common as cm
    from ..ops import decode_kernel_v6 as dk6
    dtype = jnp.dtype(dtype_str)
    sdt = jnp.dtype(state_dtype_str)

    @jax.jit
    def seed(params, init_tokens, state, n_valid=None):
        pe = cm.sinusoidal_table(cfg.max_len, cfg.d_model, dtype)
        st = _seed_state(params, cfg, init_tokens, state, pe, dtype,
                         n_valid)
        s6, z6 = dk6.pack_state_v6(st.s.astype(jnp.float32).astype(sdt),
                                   st.z.astype(jnp.float32).astype(sdt))
        return st, s6, z6
    return seed


def _prompt_prefill_active(t0: int) -> bool:
    """Trace-time policy: prompts of t0+ tokens seed via the parallel
    prefill (lt.forward_prefill) instead of the per-token scan.
    RLMG_PREFILL=0 disables; RLMG_PREFILL_MIN (default 16) is the
    takeover length.

    Default-on is backed by the r5 on-chip A/B (512-token prompt + 16
    sampled steps, fetch-forced reps): prefill 0.252s vs scan 0.434s at
    B=1 (1.72x) and 0.300s vs 0.447s at B=8 (1.49x) — BENCH.md r5."""
    return (os.environ.get("RLMG_PREFILL") != "0"
            and t0 >= int(os.environ.get("RLMG_PREFILL_MIN", "16")))


def _seed_state(params, cfg, init_tokens, state, pe, dtype, n_valid=None):
    """Teacher-force `init_tokens` into the XLA recurrent state: the
    parallel prefill (lt.forward_prefill) for long prompts, the
    per-token scan below RLMG_PREFILL_MIN (both envs read at trace
    time).  v6/v7 are stochastic throughput paths, so prefill's
    accumulation-order numerics are in-contract here.  `n_valid` (traced)
    marks the true prompt length when the caller bucket-padded
    init_tokens (lt.prefill_bucket) — only legal when the prefill branch
    is active (callers gate on _prompt_prefill_active)."""
    t0 = init_tokens.shape[1]
    if _prompt_prefill_active(t0):
        _, st = lt.forward_prefill(params, cfg, init_tokens, n_valid,
                                   pe_table=pe)
        return lt.DecodeState(st.s.astype(state.s.dtype),
                              st.z.astype(state.z.dtype), st.step)

    def body(carry, tok):
        h, st = carry
        h, st = lt.decode_step(params, cfg, tok, st, pe_table=pe)
        return (h, st), None

    b = init_tokens.shape[0]
    h0 = jnp.zeros((b, cfg.d_model), dtype)
    (_, st), _ = jax.lax.scan(body, (h0, state),
                              init_tokens.transpose(1, 0, 2))
    return st


@functools.lru_cache(maxsize=32)
def _persistent_chunk_fn(cfg, n, greedy, temps, topps):
    from ..ops import decode_kernel_v6 as dk6

    @jax.jit
    def chunk(v6p, tokT, s6, z6, seed, t_start):
        # t_start is traced (dynamic pe slice): chunks share one compile
        return dk6.fused_decode_v6(
            v6p, tokT, s6, z6, t_start, seed, n_head=cfg.n_head,
            max_tokens=n, vocab_sizes=cfg.vocab_sizes, temps=temps,
            topps=topps, greedy=greedy, eps=cfg.attn_eps)
    return chunk


@functools.lru_cache(maxsize=16)
def _latency_pack_fn(cfg, dtype_str):
    from ..models import common as cm
    from ..ops.experimental import decode_kernel_v8 as dk8

    @jax.jit
    def pack(params):
        pe = cm.sinusoidal_table(cfg.max_len, cfg.d_model, jnp.float32)
        return dk8.make_resident_params(params, cfg, pe,
                                        dtype=jnp.dtype(dtype_str))
    return pack


@functools.lru_cache(maxsize=16)
def _latency_seed_fn(cfg, dtype_str, state_dtype_str):
    """Teacher-forced seeding through the XLA recurrent path + packing
    into the v4/v7/v8 head-pair state layout."""
    from ..models import common as cm
    from ..ops.experimental import decode_kernel_v8 as dk8
    dtype = jnp.dtype(dtype_str)
    sdt = jnp.dtype(state_dtype_str)

    @jax.jit
    def seed(params, init_tokens, state, n_valid=None):
        pe = cm.sinusoidal_table(cfg.max_len, cfg.d_model, dtype)
        st = _seed_state(params, cfg, init_tokens, state, pe, dtype,
                         n_valid)
        s4, z4 = dk8.pack_state_pair(st.s.astype(jnp.float32).astype(sdt),
                                     st.z.astype(jnp.float32).astype(sdt))
        return st, s4, z4
    return seed


@functools.lru_cache(maxsize=32)
def _latency_chunk_fn(cfg, n, greedy, temps, topps, version="v8"):
    if version == "v7":
        from ..ops.experimental import decode_kernel_v7 as dk
        fused = dk.fused_decode_v7
    else:
        from ..ops.experimental import decode_kernel_v8 as dk
        fused = dk.fused_decode_v8

    @jax.jit
    def chunk(rp, tokT, s4, z4, seed, t_start):
        return fused(
            rp, tokT, s4, z4, t_start, seed, n_head=cfg.n_head,
            max_tokens=n, vocab_sizes=cfg.vocab_sizes, temps=temps,
            topps=topps, greedy=greedy, eps=cfg.attn_eps)
    return chunk


def latency_kernel_version() -> str:
    """Which latency-family kernel the latency path dispatches to:
    "v8" (one grid program per token, in-kernel layer fori_loop) or
    "v7" (grid (T, L)).  Both are quarantined experimental kernels with
    measured NEGATIVE on-chip results (BENCH.md r4/r5: v8 465 us/step at
    B=1 vs v4's 329); the family is opt-in only (latency_max_batch()
    defaults to 0) and kept for A/Bs.  RLMG_LATENCY_KERNEL overrides."""
    v = os.environ.get("RLMG_LATENCY_KERNEL", "v8")
    if v not in ("v7", "v8"):
        raise ValueError(f"RLMG_LATENCY_KERNEL must be v7 or v8, got {v!r}")
    return v


_PACKED_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_PACKED_CACHE_SIZE = 8


def _packed_decode_params(params, cfg, dtype, backend: str):
    """Pack the weights into the v6 (transposed) or v7 (pair/resident)
    layout once per params object: serving reuses the same weights call
    after call, and repacking ~50MB of transposes every generate call was
    a measurable slice of the v6 integration overhead (BENCH.md r3).
    Keyed on object identity with a strong ref, so the id cannot be
    recycled while cached; LRU eviction (VERDICT r3 weak #6)."""
    # v7/v8 share the resident pair-packed layout — one packing serves both
    fam = "latency" if backend in ("v7", "v8") else backend
    key = (id(params), cfg, str(dtype), fam)
    hit = _PACKED_CACHE.get(key)
    if hit is not None and hit[0] is params:
        _PACKED_CACHE.move_to_end(key)
        return hit[1]
    pack = (_persistent_pack_fn if backend == "v6"
            else _latency_pack_fn)(cfg, str(dtype))
    packed = pack(params)
    while len(_PACKED_CACHE) >= _PACKED_CACHE_SIZE:
        _PACKED_CACHE.popitem(last=False)
    _PACKED_CACHE[key] = (params, packed)
    return packed


def generate_tokens_persistent(params, cfg: LinearTransformerConfig,
                               rng: jax.Array, init_tokens: jax.Array, *,
                               max_tokens: int,
                               bar_cond: Optional[int] = None,
                               token_count: Optional[int] = None,
                               barbeat_field: int = 2, bar_token_id: int = 1,
                               greedy: bool = False,
                               settings: Tuple[smp.FieldSampling, ...] =
                               tuple(smp.CP_SAMPLING),
                               chunk: Optional[int] = None) -> GenResult:
    """generate_tokens via the v6 persistent kernel (ops/decode_kernel_v6).

    The sequential token loop never leaves the chip: each pallas_call
    decodes up to `chunk` tokens; the host only checks the bar-count stop
    between chunks (the scan path checks it every token inside one XLA
    while_loop — same stop semantics, coarser exit granularity).  Seed
    tokens are teacher-forced through the XLA decode_step first, then the
    state is packed into the v6 transposed layout.

    Numerics: sampling settings and stop rules match generate_tokens;
    the stochastic RNG stream is the kernel's on-core PRNG (distribution-
    equal, different draws).  Greedy streams agree with the XLA path on
    ~98-99.7% of teacher-forced per-step decisions but diverge at near-ties
    (MXU bf16-input rounding differs across layouts — decode_kernel_v6
    docstring); the exact invariant is chunk invariance, gated by
    tests/test_persistent_decode_tpu.py."""
    return _generate_tokens_chunked(
        "v6", params, cfg, rng, init_tokens, max_tokens=max_tokens,
        bar_cond=bar_cond, token_count=token_count,
        barbeat_field=barbeat_field, bar_token_id=bar_token_id,
        greedy=greedy, settings=settings, chunk=chunk)


def generate_tokens_latency(params, cfg: LinearTransformerConfig,
                            rng: jax.Array, init_tokens: jax.Array, *,
                            max_tokens: int,
                            bar_cond: Optional[int] = None,
                            token_count: Optional[int] = None,
                            barbeat_field: int = 2, bar_token_id: int = 1,
                            greedy: bool = False,
                            settings: Tuple[smp.FieldSampling, ...] =
                            tuple(smp.CP_SAMPLING),
                            chunk: Optional[int] = None) -> GenResult:
    """generate_tokens via the latency-family kernels: v8
    (ops/experimental/decode_kernel_v8, default — ONE grid program per
    token with an in-kernel fori_loop over layer slabs) or v7
    (ops/experimental/decode_kernel_v7, grid (T, L));
    RLMG_LATENCY_KERNEL selects.  Both measured NEGATIVE vs v4 on chip
    (BENCH.md r5) and are opt-in A/B paths only.  Both keep
    all weights + state VMEM-resident across the chunk, so per-token HBM
    traffic is one pe row in and one token row out — built for the
    reference's actual serving scenario (one song at a time,
    dqn_policy/testing-no-type-cp.py:182-224).  Batch pads to a multiple
    of 8 (sublane tile); intended for B <= latency_max_batch()."""
    return _generate_tokens_chunked(
        latency_kernel_version(), params, cfg, rng, init_tokens,
        max_tokens=max_tokens,
        bar_cond=bar_cond, token_count=token_count,
        barbeat_field=barbeat_field, bar_token_id=bar_token_id,
        greedy=greedy, settings=settings, chunk=chunk)


def _generate_tokens_chunked(backend: str, params, cfg, rng, init_tokens, *,
                             max_tokens, bar_cond, token_count,
                             barbeat_field, bar_token_id, greedy, settings,
                             chunk) -> GenResult:
    b_real, t0_len, nf = init_tokens.shape
    if chunk is None:
        # fixed token budget: one kernel call for everything (chunk=256 vs
        # 128 at B=1024 measured +1.3%, no inter-chunk dispatch latency),
        # capped at 256 — the v6 per-step pe slab input is (T, D, 128) f32,
        # so unbounded T would drag a multi-hundred-MB operand along.
        # bar-stop runs: 128 keeps the host exit check reasonably granular.
        chunk = min(max_tokens, 256) if bar_cond is None else 128
    # v6 carries batch on the LANE dimension (128-tile); v7 on sublanes
    # (8-tile).  Pad with copies of song 0 and slice the results back.
    tile = 128 if backend == "v6" else 8
    b = -(-b_real // tile) * tile
    if b != b_real:
        pad = jnp.tile(init_tokens[:1], (b - b_real, 1, 1))
        init_tokens = jnp.concatenate([init_tokens, pad], axis=0)
    dtype = params["in_linear"]["w"].dtype
    sdt = decode_state_dtype()

    # all jitted pieces are module-level LRU caches keyed on static config
    # (params/packed are TRACED args) — defining them per call would pay a
    # compile-cache reload (~45s through the tunnel) on every invocation
    packed = _packed_decode_params(params, cfg, dtype, backend)
    state = lt.init_decode_state(cfg, b)
    # kernel contract (parity-verified by scripts/profile_decode_v6.py):
    # the state is BEFORE tok0T — the kernel feeds tok0T itself at
    # position t_start and emits its successor.  So teacher-force all
    # init tokens EXCEPT the last, and hand the kernel the last one.
    seed_fn = (_persistent_seed_fn if backend == "v6"
               else _latency_seed_fn)(cfg, str(dtype), str(sdt))
    prompt = init_tokens[:, :-1, :]
    n_valid = None
    if _prompt_prefill_active(prompt.shape[1]):
        # bucket-pad the prompt so serving with varied prompt lengths
        # compiles one seed program per 64-token bucket, not per exact
        # length (a cold compile through the tunnel costs ~45s)
        tb = lt.prefill_bucket(prompt.shape[1])
        if tb != prompt.shape[1]:
            n_valid = jnp.asarray(prompt.shape[1], jnp.int32)
            prompt = jnp.pad(prompt, ((0, 0), (0, tb - prompt.shape[1]),
                                      (0, 0)))
    state, s_p, z_p = seed_fn(params, prompt, state, n_valid)
    tokT = init_tokens[:, -1, :].astype(jnp.int32).T      # (nf, B)

    temps = tuple(s.temperature for s in settings)
    topps = tuple(s.top_p if s.top_p is not None else float("inf")
                  for s in settings)
    # kernel PRNG seed stays a DEVICE scalar: `int(...)` here would be a
    # blocking ~10-40 ms D2H fetch before the first chunk dispatch
    # (measured slice of the r2 integration overhead).  Mask so
    # seed0 + done_t can never overflow int32.
    seed0 = (jax.random.randint(rng, (), 0, 2 ** 31 - 1)
             & 0x3FFFFFFF).astype(jnp.int32)
    if backend == "v6":
        def chunk_fn(tokT, s6, z6, seed, t_start, n):
            return _persistent_chunk_fn(cfg, n, greedy, temps, topps)(
                packed, tokT, s6, z6, seed, t_start)
    else:
        def chunk_fn(tokT, s6, z6, seed, t_start, n):
            return _latency_chunk_fn(cfg, n, greedy, temps, topps,
                                     backend)(
                packed, tokT, s6, z6, seed, t_start)
    s6, z6 = s_p, z_p

    init_bars = jnp.sum(init_tokens[..., barbeat_field] == bar_token_id,
                        axis=1).astype(jnp.int32)

    pieces = []
    done_t = 0
    bars_so_far = init_bars
    def dispatch(tokT, s6, z6, done_t):
        # t_start = the position tok0T of this chunk is FED at: the last
        # init token sits at t0_len-1, each chunk then advances by n
        n = min(chunk, max_tokens - done_t)
        return chunk_fn(
            tokT, s6, z6, seed0 + jnp.int32(done_t),
            jnp.asarray(t0_len - 1 + done_t, jnp.int32), n), n

    # pipelined chunk loop: the NEXT chunk is dispatched BEFORE the
    # (blocking) bar-count fetch for the current one, so the device keeps
    # decoding while the host waits on the D2H read (~10-40 ms through the
    # tunnel).  If the fetch says all songs are done, the speculative chunk
    # is simply dropped — its tokens would be masked invalid by assemble
    # anyway, so speculation never changes results.
    cur, cur_n = dispatch(tokT, s6, z6, 0)
    if bar_cond is not None and bool(jnp.all(init_bars[:b_real] >= bar_cond)):
        # seed alone already satisfies the bar condition (the scan path's
        # while_loop exits immediately too).  Checked AFTER the first
        # dispatch so the fetch overlaps chunk-0 decode in the common case;
        # chunk 0 is dropped here, its tokens would be all-invalid anyway.
        return GenResult(tokens=init_tokens.astype(jnp.int32)[:b_real],
                         valid=jnp.ones((b_real, t0_len), bool),
                         n_bars=init_bars[:b_real])
    while True:
        toksT, s6, z6 = cur
        pieces.append(toksT)                              # (n, nf, B)
        done_t += cur_n
        nxt = None
        if done_t < max_tokens:
            nxt = dispatch(toksT[-1], s6, z6, done_t)
        if bar_cond is not None:
            # running total: one reduction per chunk, not per-piece re-sums
            bars_so_far = bars_so_far + jnp.sum(
                toksT[:, barbeat_field, :] == bar_token_id, axis=0)
            if bool(jnp.all(bars_so_far[:b_real] >= bar_cond)):
                break
        if nxt is None:
            break
        cur, cur_n = nxt

    # one jitted assembly call (each separate dispatch pays ~10-40ms of
    # tunnel latency; this was a measurable slice of short generations)
    res = _persistent_assemble_fn(
        bar_cond, token_count, barbeat_field, bar_token_id, b_real, t0_len,
        len(pieces))(init_tokens, init_bars, tuple(pieces))
    return res


@functools.lru_cache(maxsize=32)
def _persistent_assemble_fn(bar_cond, token_count, barbeat_field,
                            bar_token_id, b_real, t0_len, n_pieces):
    """Post-hoc validity/bars with the scan path's exact semantics: a
    token is valid while the song had < bar_cond bars BEFORE it; the token
    that reaches bar_cond is kept."""

    @jax.jit
    def assemble(init_tokens, init_bars, pieces):
        toks = jnp.concatenate(pieces, axis=0).transpose(2, 0, 1)
        b, T = toks.shape[0], toks.shape[1]
        is_bar = (toks[..., barbeat_field] == bar_token_id)
        bars_after = init_bars[:, None] + jnp.cumsum(is_bar, axis=1)
        bars_before = bars_after - is_bar
        if bar_cond is not None:
            valid = bars_before < bar_cond
            n_bars = jnp.minimum(bars_after[:, -1],
                                 jnp.maximum(init_bars, bar_cond))
            toks = jnp.where(valid[:, :, None], toks, 0)
        else:
            valid = jnp.ones((b, T), bool)
            n_bars = bars_after[:, -1]
        if token_count is not None:
            idx = jnp.arange(T)[None, :]
            valid = valid & (idx < token_count)
        tokens = jnp.concatenate([init_tokens.astype(jnp.int32), toks],
                                 axis=1)
        valid = jnp.concatenate([jnp.ones((b, t0_len), bool), valid],
                                axis=1)
        return GenResult(tokens=tokens[:b_real], valid=valid[:b_real],
                         n_bars=n_bars[:b_real])
    return assemble


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_tokens", "bar_cond", "token_count",
                     "barbeat_field", "bar_token_id", "greedy", "settings",
                     "fused", "fused_sampling"))
def generate_tokens(params, cfg: LinearTransformerConfig, rng: jax.Array,
                    init_tokens: jax.Array, *, max_tokens: int,
                    bar_cond: Optional[int] = None,
                    token_count: Optional[int] = None,
                    barbeat_field: int = 2, bar_token_id: int = 1,
                    greedy: bool = False,
                    settings: Tuple[smp.FieldSampling, ...] = tuple(smp.CP_SAMPLING),
                    fused: bool = False,
                    fused_sampling: bool = False,
                    n_valid: Optional[jax.Array] = None,
                    ) -> GenResult:
    """init_tokens (B, T0, n_fields) seeds the state (teacher-forced), then
    `max_tokens` sampled steps.  Returns seed+generated tokens.

    fused=True decodes through the v3 whole-step Pallas kernel
    (ops/decode_kernel_v3) — +37-45% tokens/sec on v5e, TPU-only.

    `n_valid` (traced scalar): true prompt length when the caller
    bucket-padded init_tokens (lt.prefill_bucket) so varied prompt
    lengths share one compiled program per bucket.  Only legal when the
    prefill seed branch is active (non-greedy, length >= the prefill
    threshold) — the teacher-forced scan would feed the pad rows.  Pad
    rows come back with valid=False."""
    b, t0, nf = init_tokens.shape
    # the fused per-step kernels carry batch on sublanes: Mosaic rejects
    # vector loads whose leading dim is not 1 or a multiple of the 8-row
    # sublane tile (found at B=5, the reference's own 5-song scenario) —
    # pad with copies of song 0 and slice the results back
    b_real = b
    if fused and b % 8 != 0 and b != 1:
        b = -(-b // 8) * 8
        pad = jnp.tile(init_tokens[:1], (b - b_real, 1, 1))
        init_tokens = jnp.concatenate([init_tokens, pad], axis=0)
    from ..models import common as cm
    dtype = params["in_linear"]["w"].dtype  # share one table across steps
    pe = cm.sinusoidal_table(cfg.max_len, cfg.d_model, dtype)

    if fused and cfg.n_head % 2 == 0:
        # head-pair packed kernel (v4): +27% over v3 on v5e (BENCH.md)
        from ..ops import decode_kernel_v4 as dk4
        v4p = dk4.make_v4_params(params, cfg, dtype=dtype)
        state = dk4.init_pair_state(cfg, b)
        step_fn = functools.partial(dk4.decode_step_v4, params, v4p, cfg,
                                    pe_table=pe)
    elif fused:
        from ..ops import decode_kernel_v3 as dk3
        v3p = dk3.make_v3_params(params, cfg, dtype=dtype)
        state = lt.DecodeState(dk3.init_aug_state(cfg, b),
                               jnp.zeros((1,), jnp.float32),
                               jnp.zeros((), jnp.int32))
        step_fn = functools.partial(dk3.decode_step_v3, params, v3p, cfg,
                                    pe_table=pe)
    else:
        state = lt.init_decode_state(cfg, b)
        step_fn = functools.partial(lt.decode_step, params, cfg, pe_table=pe)

    # prompt ingestion: long non-greedy prompts run the PARALLEL prefill
    # (one training-style forward, lt.forward_prefill) instead of T0
    # sequential per-token steps — the serving prefill/decode split.
    # Greedy keeps the scan: the chunked attention accumulates in a
    # different order, so prefill streams are float-close but not
    # bit-identical (the generate_songs greedy pin).  RLMG_PREFILL=0
    # disables; RLMG_PREFILL_MIN (default 16, read at trace time) sets
    # the prompt length where the parallel pass takes over.
    prefill_ok = (not greedy and not (fused and cfg.n_head % 2 != 0)
                  and os.environ.get("RLMG_PREFILL") != "0"
                  and t0 >= int(os.environ.get("RLMG_PREFILL_MIN", "16")))
    if prefill_ok:
        hp, dstate = lt.forward_prefill(params, cfg, init_tokens, n_valid,
                                        pe_table=pe)
        h = hp.astype(dtype)
        if fused:   # v4 pair layout (even n_head guaranteed above)
            from ..ops.experimental.decode_kernel_v8 import pack_state_pair
            sdt = state.s.dtype
            s4, z4 = pack_state_pair(dstate.s.astype(sdt),
                                     dstate.z.astype(sdt))
            state = dk4.PairState(s4, z4, dstate.step)
        else:
            state = lt.DecodeState(dstate.s.astype(state.s.dtype),
                                   dstate.z.astype(state.z.dtype),
                                   dstate.step)
    else:
        h = jnp.zeros((b, cfg.d_model), dtype)
        # seed: feed init tokens (n_valid padding is prefill-only — the
        # scan would teacher-force the pad rows)
        def seed_body(carry, tok):
            h, state = carry
            h, state = step_fn(tok, state)
            return (h, state), None
        (h, state), _ = jax.lax.scan(seed_body, (h, state),
                                     init_tokens.transpose(1, 0, 2))

    seed_valid = (jnp.ones((b, t0), bool) if n_valid is None
                  else jnp.broadcast_to(jnp.arange(t0)[None, :] < n_valid,
                                        (b, t0)))
    init_bars = jnp.sum((init_tokens[..., barbeat_field] == bar_token_id)
                        & seed_valid, axis=1).astype(jnp.int32)

    if fused_sampling:
        # one (D, sum V_f) head matmul + the fused sort-free sampler
        hw, hb = cm.fused_head_params(params["heads"], cfg.n_fields)

    def step(carry, rng_t):
        h, state, bars, done = carry
        if fused_sampling:
            logits_cat = h @ hw + hb
            tok = smp.sample_fields_fused(rng_t, logits_cat, cfg.vocab_sizes,
                                          settings, greedy=greedy)
        else:
            logits = lt.forward_output(params, cfg, h)
            tok = smp.sample_fields(rng_t, logits, settings, greedy=greedy)
        tok = jnp.where(done[:, None], jnp.zeros_like(tok), tok)
        is_bar = (tok[..., barbeat_field] == bar_token_id) & (~done)
        bars = bars + is_bar.astype(jnp.int32)
        valid_now = ~done
        if bar_cond is not None:
            done = done | (bars >= bar_cond)
        h, state = step_fn(tok, state)
        return (h, state, bars, done), (tok, valid_now)

    rngs = jax.random.split(rng, max_tokens)
    done0 = jnp.zeros((b,), bool)
    if bar_cond is not None:
        done0 = init_bars >= bar_cond

    if bar_cond is not None:
        # early-exit decode (SURVEY §7.6): a while_loop stops as soon as
        # every song reached its bar count instead of always burning
        # max_tokens steps; emitted tokens land in a preallocated buffer.
        toks_buf = jnp.zeros((max_tokens, b, nf), jnp.int32)
        valid_buf = jnp.zeros((max_tokens, b), bool)

        def cond(c):
            t, _, _, _, done, _, _ = c
            return jnp.logical_and(t < max_tokens, ~jnp.all(done))

        def body(c):
            t, h, state, bars, done, tb, vb = c
            (h, state, bars, done), (tok, valid_now) = step(
                (h, state, bars, done), rngs[t])
            tb = jax.lax.dynamic_update_slice_in_dim(tb, tok[None], t, 0)
            vb = jax.lax.dynamic_update_slice_in_dim(vb, valid_now[None], t, 0)
            return t + 1, h, state, bars, done, tb, vb

        (_, _, _, bars, _, toks, valid) = jax.lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), h, state, init_bars, done0,
             toks_buf, valid_buf))
    else:
        (_, _, bars, _), (toks, valid) = jax.lax.scan(
            step, (h, state, init_bars, done0), rngs)
    toks = toks.transpose(1, 0, 2)          # (B, T, nf)
    valid = valid.transpose(1, 0)           # (B, T)
    if token_count is not None:
        idx = jnp.arange(max_tokens)[None, :]
        valid = valid & (idx < token_count)
    tokens = jnp.concatenate([init_tokens.astype(jnp.int32), toks], axis=1)
    valid = jnp.concatenate([seed_valid, valid], axis=1)
    return GenResult(tokens=tokens[:b_real], valid=valid[:b_real],
                     n_bars=bars[:b_real])


def generate_songs(params, cfg: LinearTransformerConfig,
                   gen_cfg: GenerateConfig, *, rng: Optional[jax.Array] = None,
                   init: Sequence[int] = CP_SEED, mesh=None) -> list:
    """Host-side convenience: returns a list of (n_tokens_i, nf) numpy arrays,
    one per song (valid prefix only).  `init` is either one seed token row
    or a (T0, nf) prompt (e.g. an encoded MIDI for continuation).

    `mesh`: optional ('dp','tp') jax Mesh — weights get the Megatron tp
    shardings (parallel/sharding.py, heads shard over qkv columns), the
    song batch shards over dp; tokens match single-device decode
    (tests/test_sharded_generation.py)."""
    import numpy as np
    rng = rng if rng is not None else jax.random.PRNGKey(gen_cfg.seed)
    b = gen_cfg.batch_size
    init_arr = jnp.asarray(init, jnp.int32)
    if init_arr.ndim == 1:
        init_arr = init_arr[None, :]
    init_tokens = jnp.tile(init_arr[None], (b, 1, 1))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel import shard_params
        params = shard_params(mesh, params)
        dp_spec = P("dp", None, None) if b % mesh.shape["dp"] == 0 else P()
        init_tokens = jax.device_put(init_tokens, NamedSharding(mesh, dp_spec))
    kwargs = dict(
        max_tokens=gen_cfg.max_tokens,
        bar_cond=gen_cfg.bar_production if gen_cfg.token_count is None else None,
        token_count=gen_cfg.token_count,
        greedy=gen_cfg.greedy,
        settings=tuple(smp.GREEDY) if gen_cfg.greedy else tuple(smp.CP_SAMPLING))
    if gen_cfg.greedy:
        # Greedy is the byte-identical verification mode (BASELINE.md's
        # north star), so it pins the bit-stable XLA scan path regardless
        # of platform and batch size: every fused path computes the same
        # math in a different accumulation order (MXU layouts), which can
        # flip argmax at near-ties — v6 agrees with XLA on only ~98.4% of
        # per-step greedy decisions (decode_kernel_v6 numerics contract),
        # and no fused path is *tested* bitwise against XLA.  Without this
        # pin, "greedy decode" output depended on batch size (VERDICT r3
        # weak #3).  Explicit env opt-ins (RLMG_PERSISTENT_DECODE=1 /
        # RLMG_FUSED_DECODE=1 / RLMG_FUSED_SAMPLING=1) restore
        # throughput-mode greedy for users who prefer speed over
        # bit-stability.  Invariance gated by tests/test_golden_decode.py.
        use_pers = os.environ.get("RLMG_PERSISTENT_DECODE") == "1"
        use_lat = os.environ.get("RLMG_LATENCY_DECODE") == "1"
        use_f = os.environ.get("RLMG_FUSED_DECODE") == "1"
        use_fs = os.environ.get("RLMG_FUSED_SAMPLING") == "1"
    else:
        use_pers = use_persistent_decode(batch=b)
        use_lat = use_latency_decode(batch=b)
        use_f = use_fused_decode()
        use_fs = use_fused_sampling()
    if cfg.n_head % 2 != 0:
        # the v6/v7 chunked kernels are head-PAIR packed; odd-head
        # configs decode through the per-step path (v3 handles odd heads)
        use_pers = use_lat = False
    if mesh is None and use_lat:
        res = generate_tokens_latency(params, cfg, rng, init_tokens,
                                      **kwargs)
    elif mesh is None and use_pers:
        res = generate_tokens_persistent(params, cfg, rng, init_tokens,
                                         **kwargs)
    else:
        n_valid = None
        t0p = init_tokens.shape[1]
        if (not gen_cfg.greedy and not (use_f and cfg.n_head % 2 != 0)
                and _prompt_prefill_active(t0p)):
            # bucket-pad the prompt so serving with varied prompt lengths
            # compiles one program per 64-token bucket (a cold compile
            # through the tunnel costs ~45s); prefill masks the pad rows
            # out of the state and they return valid=False
            tb = lt.prefill_bucket(t0p)
            if tb != t0p:
                n_valid = jnp.asarray(t0p, jnp.int32)
                init_tokens = jnp.pad(init_tokens,
                                      ((0, 0), (0, tb - t0p), (0, 0)))
        res = generate_tokens(
            params, cfg, rng, init_tokens, **kwargs,
            fused=use_f, fused_sampling=use_fs, n_valid=n_valid)
    tokens = np.asarray(res.tokens)
    valid = np.asarray(res.valid)
    return [tokens[i][valid[i]] for i in range(b)]
