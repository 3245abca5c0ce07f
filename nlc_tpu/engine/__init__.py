from .loops import (
    DenoiseConfig, ModelBundle, make_clip_fn, init_noise,
    denoise_loop, projection_loop, build_denoise_fn, build_projection_fn,
)
