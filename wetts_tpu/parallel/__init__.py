"""Device mesh + sharding helpers."""

from wetts_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    host_shard_info,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "host_shard_info"]
