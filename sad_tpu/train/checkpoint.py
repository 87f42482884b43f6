"""Checkpoint save/load + converter for reference-format pickle weights.

Native format: a pickled dict
  {'params': <nested numpy pytree>, 'velocity': <pytree|None>,
   'iter': int, 'cfg_yaml': str}
replacing the reference's flat {'blobs': {unscoped_name: ndarray}, 'cfg': yaml}
(lib/utils/net.py:149-182). AUTO_RESUME scans for model_iter{N}.pkl /
model_final.pkl exactly like train_net.py:208-233.

The converter maps the reference's Caffe2 blob naming (conv1_w,
res2_0_branch2a_w, fpn_inner_res5_2_sum_w, retnet_cls_pred_fpn3_w, ...) to the
sad_tpu Flax param tree and back — module names were chosen to mirror blob
names so this is a pure rename + OIHW->HWIO transpose. This is what unlocks
mAP-parity testing against released reference weights (SURVEY.md §7 step 2).
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


# --------------------------------------------------------------------------- #
# Native checkpoints
# --------------------------------------------------------------------------- #


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    params: Any,
    velocity: Any = None,
    iteration: int = 0,
    cfg_yaml: str = "",
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": _to_numpy(params),
        "velocity": _to_numpy(velocity) if velocity is not None else None,
        "iter": int(iteration),
        "cfg_yaml": cfg_yaml,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)  # atomic — a crash never leaves a torn checkpoint


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def find_latest_checkpoint(output_dir: str) -> Tuple[Optional[str], int]:
    """AUTO_RESUME scan (ref: train_net.py:208-233): model_final.pkl wins,
    else the highest model_iter{N}.pkl. Returns (path|None, start_iter)."""
    final = os.path.join(output_dir, "model_final.pkl")
    if os.path.exists(final):
        return final, -1
    best, best_iter = None, -1
    if os.path.isdir(output_dir):
        for fn in os.listdir(output_dir):
            m = re.match(r"model_iter(\d+)\.pkl$", fn)
            if m and int(m.group(1)) > best_iter:
                best_iter = int(m.group(1))
                best = os.path.join(output_dir, fn)
    return best, (best_iter + 1 if best else 0)


# --------------------------------------------------------------------------- #
# Reference-format conversion
# --------------------------------------------------------------------------- #


def _iter_param_paths(tree: Any, prefix=()):  # yields (path_tuple, leaf)
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_param_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def _caffe2_name(path: Tuple[str, ...]) -> Optional[str]:
    """Flax param path -> Caffe2 blob name. Returns None if unknown."""
    *mods, leaf = path
    module = mods[-1] if mods else ""
    if module.endswith("_bn"):
        if leaf in ("s", "b"):
            return f"{module}_{leaf}"
        return None
    if leaf == "kernel":
        return f"{module}_w"
    if leaf == "bias":
        return f"{module}_b"
    return None


def flax_to_reference_blobs(params: Any) -> Dict[str, np.ndarray]:
    """Export a sad_tpu param tree to reference blob naming (HWIO->OIHW)."""
    blobs: Dict[str, np.ndarray] = {}
    for path, leaf in _iter_param_paths(params):
        name = _caffe2_name(path)
        if name is None:
            raise ValueError(f"Cannot map param path {path} to a blob name")
        arr = np.asarray(leaf)
        if path[-1] == "kernel":
            arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        blobs[name] = arr
    return blobs


def reference_blobs_to_flax(
    blobs: Dict[str, np.ndarray],
    params_template: Any,
    strict: bool = False,
) -> Tuple[Any, list, list]:
    """Fill a param-tree template from reference blobs.

    Shape-mismatched or missing blobs are skipped with the template value
    retained (matching net.py:108-122's skip-on-mismatch behavior).
    Returns (params, loaded_names, skipped_names).
    """
    loaded, skipped = [], []

    def fill(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: fill(v, prefix + (k,)) for k, v in tree.items()}
        name = _caffe2_name(prefix)
        if name is None or name not in blobs:
            skipped.append("/".join(prefix))
            if strict:
                raise KeyError(f"Missing blob for param {'/'.join(prefix)}")
            return tree
        arr = np.asarray(blobs[name], dtype=np.float32)
        if prefix[-1] == "kernel":
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if arr.shape != tuple(tree.shape):
            skipped.append("/".join(prefix) + f" (shape {arr.shape} != {tree.shape})")
            if strict:
                raise ValueError(skipped[-1])
            return tree
        loaded.append(name)
        return arr

    return fill(params_template), loaded, skipped


def convert_reference_pickle(
    pkl_path: str, params_template: Any, strict: bool = False
) -> Tuple[Any, list, list]:
    """Load a reference checkpoint pickle ({'blobs': {...}} or a flat dict of
    blobs, py2 or py3 pickled) into a sad_tpu param tree."""
    with open(pkl_path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    blobs = data.get("blobs", data) if isinstance(data, dict) else data
    return reference_blobs_to_flax(blobs, params_template, strict=strict)


def load_reference_weights(
    pkl_path: str, params_template: Any
) -> Any:
    params, loaded, skipped = convert_reference_pickle(pkl_path, params_template)
    return params
