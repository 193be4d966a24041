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


def _flat_by_path(tree) -> dict:
    return {jax.tree_util.keystr(kp): v
            for kp, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def _restructure(loaded: Any, template: Any, what: str) -> Any:
    """Key-path-keyed restructuring: every template leaf must exist in the
    loaded tree under the SAME key path with the same shape.  A renamed or
    reordered parameter therefore fails loudly instead of silently loading
    weights into the wrong slot (the old tree_leaves/tree_unflatten pairing
    matched leaves positionally and could not detect that)."""
    flat_l = _flat_by_path(loaded)

    def pick(kp, tv):
        key = jax.tree_util.keystr(kp)
        if key not in flat_l:
            raise KeyError(
                f"{what}: checkpoint has no leaf {key!r} "
                f"(checkpoint keys: {sorted(flat_l)[:8]}...)")
        lv = flat_l[key]
        t_shape = getattr(tv, "shape", None)
        l_shape = getattr(lv, "shape", None)
        if t_shape is not None and l_shape != t_shape:
            raise ValueError(
                f"{what}: shape mismatch at {key}: checkpoint {l_shape} "
                f"vs template {t_shape}")
        return lv

    return jax.tree_util.tree_map_with_path(pick, template)


def load_checkpoint(path: str, params_template: Any = None,
                    opt_state_template: Any = None) -> dict:
    """Returns {'params', 'opt_state', 'step', 'extra'}.  When templates are
    given the loaded trees are restructured onto them by key path (name- and
    shape-checked; mismatches raise)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if params_template is not None and payload["params"] is not None:
        payload["params"] = _restructure(payload["params"], params_template,
                                         "params")
    if opt_state_template is not None and payload["opt_state"] is not None:
        payload["opt_state"] = _restructure(payload["opt_state"],
                                            opt_state_template, "opt_state")
    return payload


def load_params_lenient(path: str, params_template: Any) -> Any:
    """`strict=False`-style load (ppo_train.py:226,231): copy arrays whose
    path+shape match the template; keep template values elsewhere."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    loaded = payload["params"] if isinstance(payload, dict) and "params" in payload else payload
    flat_l = _flat_by_path(loaded)

    def merge(kp, tv):
        lv = flat_l.get(jax.tree_util.keystr(kp))
        if lv is not None and getattr(lv, "shape", None) == tv.shape:
            return lv
        return tv

    return jax.tree_util.tree_map_with_path(merge, params_template)


# ---------------------------------------------------------------------------
# Orbax backend (production: async, sharded-array-native)
# ---------------------------------------------------------------------------
#
# The pickle format above gathers every array to host before writing —
# simple and portable, but it serializes training for the full device->host
# copy and loses shardings.  The orbax backend saves jax.Arrays natively
# (per-shard, multi-host-safe) and can run ASYNCHRONOUSLY: training
# continues while the previous checkpoint streams to disk.  Step/extra
# metadata lives in a JSON sidecar so the orbax tree is pure arrays.

_ORBAX_SAVER = None


def _orbax():
    import orbax.checkpoint as ocp
    return ocp


def _orbax_saver():
    global _ORBAX_SAVER
    if _ORBAX_SAVER is None:
        ocp = _orbax()
        _ORBAX_SAVER = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ORBAX_SAVER


def save_checkpoint_orbax(path: str, params: Any, opt_state: Any = None,
                          step: int = 0, extra: Optional[dict] = None,
                          wait: bool = False) -> str:
    """Async orbax save to directory `path` (created/overwritten).  Returns
    immediately with the write in flight; call wait_for_checkpoints()
    (or pass wait=True) before reading it back or exiting the process."""
    import json
    ocp = _orbax()
    path = os.path.abspath(path)
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    saver = _orbax_saver()
    saver.save(path, args=ocp.args.StandardSave(tree), force=True)
    meta = {"step": int(step), "extra": extra or {}}
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)
    if wait:
        saver.wait_until_finished()
    return path


def wait_for_checkpoints() -> None:
    """Block until every in-flight async orbax save has committed."""
    if _ORBAX_SAVER is not None:
        _ORBAX_SAVER.wait_until_finished()


def load_checkpoint_orbax(path: str, params_template: Any = None,
                          opt_state_template: Any = None) -> dict:
    """Returns {'params','opt_state','step','extra'} like load_checkpoint.
    Templates restore arrays with the template's sharding/dtype (orbax
    restores in place onto the same device layout)."""
    import json
    ocp = _orbax()
    path = os.path.abspath(path)
    wait_for_checkpoints()
    target = None
    if params_template is not None:
        target = {"params": params_template}
        if opt_state_template is not None:
            target["opt_state"] = opt_state_template
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as reader:
        if target is not None:
            tree = reader.restore(path, args=ocp.args.StandardRestore(target))
        else:
            tree = reader.restore(path)
    meta = {"step": 0, "extra": {}}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return {"params": tree.get("params"),
            "opt_state": tree.get("opt_state"),
            "step": meta["step"], "extra": meta["extra"]}
