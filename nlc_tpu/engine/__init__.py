from .loops import (
    DenoiseConfig, ModelBundle, make_clip_fn, init_noise,
    denoise_loop, projection_loop, build_denoise_fn, build_projection_fn,
)
from .edm import EDMModelBundle, EDMSamplerConfig, edm_sampler, build_edm_sampler
from .ddnm import DDNMConfig, ddnm_sampler, build_ddnm_sampler, get_schedule_jump
