# NOTE: functions whose name equals their submodule (`ffn_block`,
# `window_attention`) are deliberately not re-exported here — binding them
# in the package namespace would shadow the submodule for
# `from ...ops import <name>` imports.  Module-path imports are canonical:
# `from ...ops.ffn_block import ffn_block`,
# `from ...ops.window_attention import window_attention`.
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
from .window_attention import window_attention_bshe

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
    "window_attention_bshe",
]
