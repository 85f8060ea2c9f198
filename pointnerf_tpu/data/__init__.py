"""Data layer: dataset registry + loaders.

Mirrors the reference registry design (data/__init__.py:9-87) with plain
Python: datasets register by name, items are dicts of numpy arrays converted
to RayBatch by the drivers.
"""
from .synthetic import (ring_cameras, sphere_gt_render, sphere_scene,
                        view_ray_batch)

DATASET_REGISTRY = {}


def register_dataset(name):
    def deco(cls):
        DATASET_REGISTRY[name] = cls
        return cls
    return deco


def find_dataset_class_by_name(name: str):
    """reference: data/__init__.py:9-30 (import-by-name registry)."""
    from . import (dtu, dtu_ft, llff, nerf_synth, nsvf, scannet,  # noqa: F401
                   waymo)
    if name not in DATASET_REGISTRY:
        raise KeyError(f"dataset '{name}' not registered; "
                       f"have {sorted(DATASET_REGISTRY)}")
    return DATASET_REGISTRY[name]
