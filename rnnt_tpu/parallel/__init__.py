"""Device mesh + sharding rules (the reference's L2 distribution layer)."""

from rnnt_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    param_sharding_rules,
    shard_params,
)
