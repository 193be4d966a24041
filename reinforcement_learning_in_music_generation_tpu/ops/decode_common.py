"""Knobs shared by the fused decode paths (v4 per-step, v6 persistent).

One helper so the RLMG_DECODE_STATE_DTYPE env var means the same thing on
every decode path (advisor r2: the two paths previously disagreed on the
unset default, so toggling RLMG_PERSISTENT_DECODE silently changed decode
numerics).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def decode_state_dtype() -> jnp.dtype:
    """Storage dtype for the recurrent decode state (the linear-attention
    (S, z) prefix sums — the KV-cache analog of this architecture).

    bfloat16 by default on ALL fused decode paths: sub-f32 cache storage is
    standard serving practice, it halves the dominant HBM stream (301K vs
    179K tok/s at batch 512, BENCH.md), and greedy streams were
    byte-identical to f32 at every tested depth (64 steps x 128 songs).
    Accumulation stays f32 in-kernel; only the stored state is rounded.

    Set RLMG_DECODE_STATE_DTYPE=float32 for bit-parity with the XLA/scan
    decode path.
    """
    env = os.environ.get("RLMG_DECODE_STATE_DTYPE")
    if env is None:
        # one-time notice (ADVICE r3): the bf16 default changed decode
        # numerics vs pre-r3 runs — make stream-level divergence
        # attributable without digging through env vars
        global _DEFAULT_LOGGED
        if not _DEFAULT_LOGGED:
            _DEFAULT_LOGGED = True
            import logging
            logging.getLogger(__name__).info(
                "decode recurrent-state dtype defaulting to bfloat16 "
                "(greedy streams byte-identical to f32 at tested depths; "
                "RLMG_DECODE_STATE_DTYPE=float32 restores the pre-r3 "
                "default)")
        return jnp.dtype("bfloat16")
    return jnp.dtype(env)


_DEFAULT_LOGGED = False


# ---------------------------------------------------------------------------
# helpers shared by the fused decode kernels (first built in the v5
# ablation instrument, production users: decode_kernel_v6)
# ---------------------------------------------------------------------------

VF_PAD = 256          # per-field lane stride in the padded heads layout
NEG = -1e30


def gumbel_from_bits(bits: "jax.Array") -> "jax.Array":
    """uint32 random bits -> standard Gumbel noise (f32).

    u in (0, 1) from the top 24 bits; argmax(log p + g) over a kept set
    samples the renormalized categorical exactly (Gumbel-max trick), so no
    inverse-CDF cumsum is needed in-kernel.  The uint32 is shifted to 24
    bits then cast via int32 (Mosaic has no uint32->f32 cast; the value
    fits in 24 bits so the signed reinterpretation is lossless)."""
    u = ((bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
         * (2.0 ** -24) + (2.0 ** -25))
    return -jnp.log(-jnp.log(u))
