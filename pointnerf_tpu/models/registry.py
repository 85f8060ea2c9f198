"""Model registry — the reference's `create_model` surface
(models/__init__.py:5-41) mapped onto this framework's trainers.

The reference resolves `--model` strings to Model classes; here each name
resolves to a small facade describing which trainer/driver realizes that
model family. Kept for API parity and discoverability; the trainers
themselves live in pointnerf_tpu.train.
"""
from __future__ import annotations

from typing import Any, Dict

MODEL_REGISTRY: Dict[str, Dict[str, Any]] = {}


def register_model(name: str, **entry):
    MODEL_REGISTRY[name] = entry


def create_model(name: str) -> Dict[str, Any]:
    """Resolve a reference model name to this framework's implementation
    entry: {'trainer': module path, 'factory': callable import path,
    'notes': ...}."""
    if name not in MODEL_REGISTRY:
        raise KeyError(f"model '{name}' not registered; "
                       f"have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name]


register_model(
    "neural_points_volumetric",
    trainer="pointnerf_tpu.train.step",
    driver="pointnerf_tpu.train.driver:train_scene",
    notes="per-scene optimization on a fixed/maintained point cloud "
          "(reference models/neural_points_volumetric_model_ori.py)")

register_model(
    "mvs_points_volumetric",
    trainer="pointnerf_tpu.train.feedforward",
    driver="pointnerf_tpu.train.driver:train_dataset_scene",
    notes="mode 0 (feed-forward MVS->points->render, run/train.py) via "
          "train/feedforward.py; mode 2 (per-scene with MVS init) via "
          "mvs/points_init.py gen_scene_points + train_scene")

register_model(
    "neural_points_volumetric_multi",
    trainer="pointnerf_tpu.train.neural2d",
    notes="feature rendering + CNN neural-render head "
          "(fork models/neural_points_volumetric_multi_model.py)")

register_model(
    "neural_points_volumetric_multiseq",
    trainer="pointnerf_tpu.train.neural2d",
    notes="multi-sequence point clouds + StyleGAN2 head with per-frame "
          "style codes; sequences map to the mp point-shard axis "
          "(fork train_ddp.py)")
