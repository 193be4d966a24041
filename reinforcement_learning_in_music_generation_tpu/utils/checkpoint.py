"""Checkpoint save/load with true resume.

The reference saves `{'epoch', 'model_state_dict', 'optimizer_state_dict'}`
via torch.save but never restores optimizer state or epoch (SURVEY §5
'Checkpoint/resume').  Here checkpoints carry model params, optimizer state
and step, and `load_checkpoint` restores all three.  Format: msgpack via
flax.serialization (host numpy arrays), one file per checkpoint.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    step: int = 0, extra: Optional[dict] = None) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": _to_host(params),
        "opt_state": _to_host(opt_state) if opt_state is not None else None,
        "step": int(step),
        "extra": extra or {},
    }
    blob = pickle.dumps(payload, protocol=pickle.HIGHEST_PROTOCOL)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, params_template: Any = None,
                    opt_state_template: Any = None) -> dict:
    """Returns {'params', 'opt_state', 'step', 'extra'}.  When templates are
    given the loaded trees are restructured onto them (shape-checked)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if params_template is not None and payload["params"] is not None:
        flat_loaded = jax.tree_util.tree_leaves(payload["params"])
        treedef = jax.tree_util.tree_structure(params_template)
        payload["params"] = jax.tree_util.tree_unflatten(treedef, flat_loaded)
    if opt_state_template is not None and payload["opt_state"] is not None:
        flat_loaded = jax.tree_util.tree_leaves(payload["opt_state"])
        treedef = jax.tree_util.tree_structure(opt_state_template)
        payload["opt_state"] = jax.tree_util.tree_unflatten(treedef, flat_loaded)
    return payload


def load_params_lenient(path: str, params_template: Any) -> Any:
    """`strict=False`-style load (ppo_train.py:226,231): copy arrays whose
    path+shape match the template; keep template values elsewhere."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    loaded = payload["params"] if isinstance(payload, dict) and "params" in payload else payload

    flat_l = dict(jax.tree_util.tree_flatten_with_path(loaded)[0] and
                  {jax.tree_util.keystr(kp): v for kp, v in
                   jax.tree_util.tree_flatten_with_path(loaded)[0]})

    def merge(kp, tv):
        key = jax.tree_util.keystr(kp)
        lv = flat_l.get(key)
        if lv is not None and getattr(lv, "shape", None) == tv.shape:
            return lv
        return tv

    return jax.tree_util.tree_map_with_path(merge, params_template)
