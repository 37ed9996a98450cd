from rho_diffusion_tpu.interop.torch_weights import (  # noqa: F401
    load_reference_modules,
    load_torch_checkpoint,
    transplant_unet_state_dict,
)
