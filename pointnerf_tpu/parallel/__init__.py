from .mesh import make_mesh
from .sharded import (ShardedScene, build_sharded_scene,
                      create_sharded_neural2d_state,
                      create_sharded_train_state, make_sharded_eval_step,
                      make_sharded_neural2d_step, make_sharded_train_step,
                      partition_points)
