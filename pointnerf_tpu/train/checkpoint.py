"""Checkpoint / resume via orbax.

Replaces the reference's torch .pth save/load (base_model.py:99-133: per-net
state_dicts + `{iter}_states.pth` with epoch/steps/best-metrics; neural-point
tensors ride inside the ray-marching state dict, neural_points.py:243-289).
Here one orbax PyTree checkpoint holds the whole TrainState (MLP params,
point cloud bucket, Adam state, step, PRNG key) plus a small JSON sidecar
with the config and bookkeeping — resume is exact, including optimizer
moments, which the reference loses on its grow-restarts.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from .step import TrainState


def _ckpt_dir(root: str, step: int) -> str:
    return os.path.join(os.path.abspath(root), f"ckpt_{step:08d}")


def save_checkpoint(root: str, state: TrainState, meta: Optional[Dict] = None):
    """Write `<root>/ckpt_<step>/` (orbax tree + meta.json)."""
    import orbax.checkpoint as ocp
    step = int(state.step)
    path = _ckpt_dir(root, step)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "state"),
               jax.tree.map(np.asarray, state), force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"step": step, **(meta or {})}, f)
    return path


def checkpoint_meta(path: str) -> Dict[str, Any]:
    """Read just the sidecar (e.g. to size the restore template before
    building it — capacity can change across grow re-buckets)."""
    meta_path = os.path.join(path, "meta.json")
    return json.load(open(meta_path)) if os.path.exists(meta_path) else {}


def latest_checkpoint(root: str) -> Optional[str]:
    """reference get_latest_epoch (train_ft.py:545-549)."""
    cands = sorted(glob.glob(os.path.join(os.path.abspath(root), "ckpt_*")))
    return cands[-1] if cands else None


def load_checkpoint(path: str, template: TrainState
                    ) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into the template's tree structure (shapes must match — the
    capacity-bucket design keeps point shapes stable across prune/grow
    within a bucket). Checkpoints written before the per-point hit counters
    (TrainState.hits) restore with fresh zero counters."""
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    try:
        restored = ckptr.restore(os.path.join(path, "state"),
                                 item=jax.tree.map(np.asarray, template))
    except Exception as first_err:
        # pre-hits on-disk layout: retry without the counters. If the retry
        # ALSO fails the problem is not the hits layout (corrupt file,
        # param-tree/shape mismatch, ...) — re-raise the ORIGINAL error so
        # the real mismatch stays visible instead of a misleading second
        # failure from the legacy-layout template.
        try:
            restored = ckptr.restore(os.path.join(path, "state"),
                                     item=jax.tree.map(
                                         np.asarray,
                                         template._replace(hits=None)))
        except Exception:
            raise first_err
    state = jax.tree.map(jax.numpy.asarray, restored)
    state = TrainState(*state) if not isinstance(restored, TrainState) else state
    if state.hits is None and template.hits is not None:
        # counters absent on disk (or dropped by the restore): re-init fresh
        state = state._replace(hits=jax.numpy.zeros_like(template.hits))
    meta_path = os.path.join(path, "meta.json")
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}
    return state, meta
