from .aggregator import AggOutput, aggregate, init_aggregator_params
from .losses import compute_losses, mse2psnr
from .points import (PointCloud, PointCloudStatic, SampledPoints, gather_points,
                     grow, make_point_cloud, prune, round_capacity)
from .ray_march import (BLEND_FUNCS, RENDER_FUNCS, TONEMAP_FUNCS,
                        alpha_ray_march, ray_march)
from .renderer import RayBatch, RenderOutput, render_rays
