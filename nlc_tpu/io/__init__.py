from .torch_convert import (
    load_torch_state_dict, convert_ddim_unet, convert_sigma_head,
)
