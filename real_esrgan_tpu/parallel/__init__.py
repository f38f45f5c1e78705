from real_esrgan_tpu.parallel.mesh import (
    broadcast_pytree, broadcast_string, make_mesh, batch_sharding,
    maybe_initialize_distributed, replicated_sharding, shard_batch,
)
