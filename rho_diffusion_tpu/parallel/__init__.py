from rho_diffusion_tpu.parallel.mesh import (  # noqa: F401
    CONTEXT_AXIS,
    DATA_AXIS,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
)
