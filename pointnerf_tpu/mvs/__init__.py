from .mvsnet import MVSNet, FeatureNet, CostRegNet, depth_regression, homo_warp
from .filter import check_geometric_consistency, filter_by_masks
from .points_init import MvsPointsInit
from .mvsnerf import (MVSNERF_DECODERS, MVSNeRFDecoder, ReferenceMVSNeRF,
                      RendererAttention, RendererColorFusion, RendererLinear,
                      RendererOurs, render_mvsnerf)
