"""Device meshes, shardings, batched + spatial parallelism."""

from leafgrasp_tpu.parallel.mesh import make_mesh, data_sharding, \
    replicated
from leafgrasp_tpu.parallel.sharding import (infer_param_shardings,
                                             shard_variables, shard_batch)
from leafgrasp_tpu.parallel.batch import make_batched_frame_fn
from leafgrasp_tpu.parallel.spatial_frame import make_sharded_frame_fn
from leafgrasp_tpu.parallel.spatial import (sharded_edt,
                                            sharded_squared_edt,
                                            sharded_nearest_seed_rows,
                                            sharded_shift_rows)
from leafgrasp_tpu.parallel.pipeline import (split_decoder_stages,
                                             shard_stage_params,
                                             make_pp_llava_forward)

__all__ = ["make_mesh", "data_sharding", "replicated",
           "infer_param_shardings", "shard_variables", "shard_batch",
           "make_batched_frame_fn", "make_sharded_frame_fn",
           "sharded_edt", "sharded_squared_edt",
           "sharded_nearest_seed_rows", "sharded_shift_rows",
           "split_decoder_stages", "shard_stage_params",
           "make_pp_llava_forward"]
