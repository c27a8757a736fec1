"""Checkpointing: orbax state snapshots + the ``config.yml`` model-card contract.

The reference checkpoints a bare ``state_dict`` to ``../models/<name>/model.pth``
when the monitored IoU improves (train.py:458-459; train_seg_gan.py:528-530),
alongside a ``config.yml`` model card (train.py:239-240).  Its resume path is
dead code and optimizer state is never saved (SURVEY.md §5).  Here:

- :func:`save_model` / :func:`load_model` — best-model snapshot (the
  ``model.pth`` equivalent, an orbax directory ``model.orbax``) holding the
  inference variables (params + batch_stats + spectral);
- :func:`save_train_state` / :func:`restore_train_state` — full state incl.
  optimizer moments and epoch for *real* resume;
- :func:`warm_start_generator` — the GAN generator warm start from a
  supervised checkpoint with ``module.`` stripping + ``strict=False``
  semantics (initialize_with_srresnet, models_seg_gan.py:216-233); also
  accepts reference ``model.pth`` files via the compat converter.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

MODEL_CKPT = "model.orbax"
STATE_CKPT = "train_state.orbax"
META_FILE = "train_meta.json"


def _abs(path: str) -> str:
    return os.path.abspath(path)


def _save_pytree(path: str, tree: Any) -> None:
    path = _abs(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree)


def _restore_pytree(path: str, template: Any) -> Any:
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(_abs(path), template)


def save_model(model_dir: str, variables: Dict[str, Any]) -> str:
    """Persist inference variables (the ``model.pth`` analogue, train.py:459)."""
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, MODEL_CKPT)
    _save_pytree(path, variables)
    return path


def load_model(model_dir: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Load inference variables saved by :func:`save_model`."""
    return _restore_pytree(os.path.join(model_dir, MODEL_CKPT), template)


def save_train_state(model_dir: str, state, epoch: int, meta: Optional[Dict] = None) -> str:
    """Full resume checkpoint: params + BN stats + spectral + optimizer + epoch."""
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, STATE_CKPT)
    _save_pytree(path, state)
    with open(os.path.join(model_dir, META_FILE), "w") as f:
        json.dump({"epoch": int(epoch), **(meta or {})}, f)
    return path


def restore_train_state(model_dir: str, state_template) -> Tuple[Any, Dict]:
    """Restore a full train state; returns (state, meta)."""
    state = _restore_pytree(os.path.join(model_dir, STATE_CKPT), state_template)
    meta_path = os.path.join(model_dir, META_FILE)
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def has_train_state(model_dir: str) -> bool:
    return os.path.isdir(os.path.join(model_dir, STATE_CKPT))


def _merge_strict_false(dst: Any, src: Any, prefix: str, report: Dict[str, list]) -> Any:
    """Copy leaves from ``src`` into ``dst`` where path+shape match
    (torch ``load_state_dict(strict=False)`` semantics,
    models_seg_gan.py:227)."""
    if isinstance(dst, dict):
        if not isinstance(src, dict):
            report["unmatched"].append(prefix)
            return dst
        out = {}
        for k, v in dst.items():
            if k in src:
                out[k] = _merge_strict_false(v, src[k], f"{prefix}.{k}", report)
            else:
                report["missing"].append(f"{prefix}.{k}")
                out[k] = v
        return out
    src_arr = np.asarray(src)
    dst_arr = np.asarray(dst)
    if src_arr.shape != dst_arr.shape:
        report["unmatched"].append(prefix)
        return dst
    report["loaded"].append(prefix)
    return src_arr.astype(dst_arr.dtype)


def warm_start_generator(
    gen_variables: Dict[str, Any],
    supervised: Any,
    from_torch_pth: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """Initialize the generator's ``net`` submodule from a supervised
    checkpoint (initialize_with_srresnet, models_seg_gan.py:216-233).

    ``supervised`` is either a variables dict from :func:`load_model`, or a
    path to a reference ``model.pth`` when ``from_torch_pth``.
    Matching is ``strict=False``: shape/path mismatches are skipped and
    reported, never fatal.
    """
    report = {"loaded": [], "missing": [], "unmatched": []}
    gen_vars = jax.tree_util.tree_map(lambda x: x, gen_variables)  # copy

    if from_torch_pth:
        from ssunet_gan_tpu.compat import load_torch_checkpoint

        # build a bare-net template view to convert into
        net_template = {
            col: tree["net"] for col, tree in gen_variables.items() if "net" in tree
        }
        converted, conv_report = load_torch_checkpoint(supervised, net_template)
        report["unmatched"].extend(conv_report["unmatched"])
        sup_vars = converted
    else:
        sup_vars = supervised

    out: Dict[str, Any] = {}
    for col, tree in gen_vars.items():
        tree = dict(tree)
        if "net" in tree and col in sup_vars:
            tree["net"] = _merge_strict_false(tree["net"], sup_vars[col], col, report)
        out[col] = tree
    return out, report
