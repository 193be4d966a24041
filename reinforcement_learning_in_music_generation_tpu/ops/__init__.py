# NOTE: the `ffn_block` FUNCTION is deliberately not re-exported here —
# binding it in the package namespace would shadow the `ops.ffn_block`
# SUBMODULE for `from ...ops import ffn_block` imports.  Use
# `from ...ops.ffn_block import ffn_block` for the function.
from .ffn_block import attn_tail_block
from .linear_attention import (
    causal_linear_attention,
    causal_linear_attention_bshe,
    causal_linear_attention_sp,
    feature_map,
    init_attention_state,
    linear_attention_step,
)
from .losses import binary_cross_entropy, fields_cross_entropy, masked_cross_entropy
from .sampling import CP_SAMPLING, FieldSampling, sample, sample_fields
from .window_attention import window_attention, window_attention_bshe

__all__ = [
    "attn_tail_block",
    "causal_linear_attention",
    "causal_linear_attention_bshe",
    "causal_linear_attention_sp",
    "feature_map",
    "init_attention_state",
    "linear_attention_step",
    "binary_cross_entropy",
    "fields_cross_entropy",
    "masked_cross_entropy",
    "CP_SAMPLING",
    "FieldSampling",
    "sample",
    "sample_fields",
    "window_attention",
    "window_attention_bshe",
]
