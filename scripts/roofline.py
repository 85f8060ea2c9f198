"""Analytic roofline of the train step at the lego bench budget.

Counts MXU matmul FLOPs and HBM activation traffic for the aggregator
decode (the step's dominant cost) in both the dense and the compacted
(QueryConfig.decode_capacity) regimes, against v5e peaks, and prints a
table to paste into PERF.md.

Usage: python scripts/roofline.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointnerf_tpu.config import bench_config
from pointnerf_tpu.models.aggregator import block_dims
from pointnerf_tpu.models.renderer import decode_slots

V5E_BF16_TFLOPS = 197.0     # MXU peak, bf16 with f32 accumulation
V5E_HBM_GBPS = 819.0        # HBM bandwidth

R, N_POINTS = 3600, 65536


def mlp_flops_per_row(dims):
    return 2 * sum(a * b for a, b in zip(dims[:-1], dims[1:]))


def main():
    cfg = bench_config()
    SR, K = cfg.query.SR, cfg.query.K
    d = block_dims(cfg.agg)
    H = cfg.agg.shading_feature_num
    RS = R * SR

    # per-neighbor-row chain: PE'd input -> block1 (2) -> block3 (2) -> alpha
    per_row_dims = ([d["in_ch"]] + [H] * cfg.agg.shading_feature_mlp_layer1)
    b3_dims = [d["b3_in"]] + [H] * cfg.agg.shading_feature_mlp_layer3
    alpha_dims = [d["alpha_in"], 1]
    per_row = (mlp_flops_per_row(per_row_dims) + mlp_flops_per_row(b3_dims)
               + mlp_flops_per_row(alpha_dims))
    # per-sample color branch
    half = H // 2
    color_dims = ([d["color_in"]] + [half] * (cfg.agg.shading_color_mlp_layer - 1)
                  + [cfg.agg.shading_color_channel_num])
    per_sample = mlp_flops_per_row(color_dims)

    C = decode_slots(cfg, RS)
    for name, rows, samples in (("dense", RS * K, RS),
                                (f"compacted C={C}", C * K, C)):
        fwd = rows * per_row + samples * per_sample
        step = 3 * fwd                       # fwd + dgrad + wgrad
        t_mxu = step / (V5E_BF16_TFLOPS * 1e12) * 1e3
        # bf16 activation traffic: each matmul reads in + writes out, x3 for
        # bwd (dgrad reads/writes + wgrad reads), + the f32 payload gather
        chain = [d["in_ch"]] + [H] * 4 + [1]
        act_bytes = rows * sum(a + b for a, b in zip(chain[:-1], chain[1:])) * 2
        col_chain = [d["color_in"]] + [half] * 3 + [3]
        act_bytes += samples * sum(a + b for a, b in
                                   zip(col_chain[:-1], col_chain[1:])) * 2
        payload = rows * (13 + cfg.agg.point_features_dim) * 4
        hbm = 3 * act_bytes + 2 * payload
        t_hbm = hbm / (V5E_HBM_GBPS * 1e9) * 1e3
        print(f"{name:22s} matmul {step/1e12:6.2f} TFLOP -> {t_mxu:6.1f} ms | "
              f"HBM ~{hbm/1e9:6.1f} GB -> {t_hbm:6.1f} ms | "
              f"decode SoL ~{max(t_mxu, t_hbm):5.1f} ms")
    print(f"\nin_ch={d['in_ch']} b3_in={d['b3_in']} color_in={d['color_in']} "
          f"H={H} rows dense={RS*K:,} compact={C*K:,}")


if __name__ == "__main__":
    main()
