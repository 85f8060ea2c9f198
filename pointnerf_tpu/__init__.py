"""pointnerf_tpu — a TPU-native Point-NeRF framework (JAX/XLA/Pallas/pjit).

Built from scratch with the capabilities of the reference CUDA/PyTorch
implementation (yjcaimeow/pointnerf): neural point clouds, voxel-grid
neighbor queries, MLP aggregation + differentiable ray marching, point
prune/grow, MVS-based initialization, and multi-chip training via
jax.sharding — redesigned for XLA's static-shape compilation model and the
TPU memory hierarchy rather than translated from CUDA.
"""
from .config import (AggregatorConfig, DataConfig, LossConfig, ParallelConfig,
                     PointNeRFConfig, PointsConfig, QueryConfig, RenderConfig,
                     TrainConfig, lego_config, tiny_test_config)

__version__ = "0.1.0"
