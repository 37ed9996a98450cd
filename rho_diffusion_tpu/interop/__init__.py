from rho_diffusion_tpu.interop.hf_unet_weights import (  # noqa: F401
    load_hf_unet2d_checkpoint,
    transplant_hf_unet2d_state_dict,
)
from rho_diffusion_tpu.interop.torch_weights import (  # noqa: F401
    export_unet_state_dict,
    load_reference_modules,
    load_torch_checkpoint,
    save_torch_checkpoint,
    transplant_unet_state_dict,
)
