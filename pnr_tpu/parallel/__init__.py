"""Device-mesh parallelism: halo-exchange stencils and sharded pipeline."""

from pnr_tpu.parallel.batch_dp import (
    reconstruction_batch_dp,
    reconstruction_batch_sharded,
    split_mesh,
)
from pnr_tpu.parallel.halo import halo_exchange_z, halo_exchange_z_aligned
from pnr_tpu.parallel.multihost import (
    init_multihost,
    make_global_mesh,
    shard_volume_global,
)
from pnr_tpu.parallel.plan import ShardPlan, min_devices, plan_sharded
from pnr_tpu.parallel.sharded import (
    assign_seeds_to_shards,
    build_local_trace_step,
    build_sharded_step,
    frangi2d_halo,
    frangi2d_sharded,
    frangi3d_sharded,
    frangi_halo,
    make_mesh,
    normalize_to_u8_sharded,
    shard_volume,
)

__all__ = [
    "halo_exchange_z",
    "halo_exchange_z_aligned",
    "init_multihost",
    "ShardPlan",
    "min_devices",
    "plan_sharded",
    "make_global_mesh",
    "shard_volume_global",
    "reconstruction_batch_dp",
    "reconstruction_batch_sharded",
    "split_mesh",
    "make_mesh",
    "frangi_halo",
    "frangi2d_halo",
    "frangi2d_sharded",
    "frangi3d_sharded",
    "normalize_to_u8_sharded",
    "shard_volume",
    "build_sharded_step",
    "build_local_trace_step",
    "assign_seeds_to_shards",
]
