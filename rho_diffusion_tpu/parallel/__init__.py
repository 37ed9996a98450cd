from rho_diffusion_tpu.parallel.mesh import (  # noqa: F401
    CONTEXT_AXIS,
    DATA_AXIS,
    active_mesh,
    batch_sharding,
    get_active_mesh,
    initialize_distributed,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
    shard_opt_state_zero1,
    create_state_fsdp,
    fsdp_abstract_state,
    fsdp_shardings,
    shard_state_fsdp,
)
from rho_diffusion_tpu.parallel.context import (  # noqa: F401
    context_sharded_attention,
    ring_attention,
)
from rho_diffusion_tpu.parallel.spatial import (  # noqa: F401
    halo_exchange,
    spatial_sharded_conv3d,
)
from rho_diffusion_tpu.parallel.ulysses import (  # noqa: F401
    ulysses_attention,
    ulysses_sharded_attention,
)
from rho_diffusion_tpu.parallel.runtime import (  # noqa: F401
    accelerator_available,
    barrier,
    get_device_stats,
    parse_devices,
    runtime_summary,
)
from rho_diffusion_tpu.parallel.tensor import (  # noqa: F401
    shard_params_for_tp,
    tp_sharding_summary,
)
