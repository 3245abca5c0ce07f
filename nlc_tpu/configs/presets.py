"""Method presets + per-dataset defaults for the sampling CLIs.

Parity with reference image_sample.py get_default (:143-268): the --method
presets bundle sampling/sigma_type/sigma_style/norm_eps/redesign/continuous_t/
refine flags, and each dataset config pins norm_max/norm_min/clip_fn/
sampler_var.
"""
from __future__ import annotations

METHODS = (
    "default", "base", "pred_denoise_base", "pred_denoise_proj",
    "pred_denoise_proj_arbit", "pred_proj", "pred_denoise_base_nonorm",
    "pred_denoise_base_norefine", "pred_partial_denoise_base",
)

DATASET_DEFAULTS = {
    # config -> (norm_max, norm_min, clip_fn, sampler_var)
    "cifar10": (54.63, 0.0, "clamp", "learned"),
    "imagenet": (440.0, 0.0, "dynamic", "learned"),
    "celeba": (110.0, -2.0, "clamp", "learned"),
    "celeba_hq": (397.0, 0.0, None, "fixedsmall"),
}


def apply_dataset_defaults(args) -> None:
    d = DATASET_DEFAULTS.get(args.config)
    if d is None:
        args.norm_max = None
        args.norm_min = None
        return
    norm_max, norm_min, clip_fn, sampler_var = d
    args.norm_max = norm_max
    args.norm_min = norm_min
    if clip_fn is not None:
        args.clip_fn = clip_fn
    args.sampler_var = sampler_var


def apply_method_preset(args) -> None:
    m = args.method
    if m == "base":
        args.sampling = "denoise"
        args.sigma_type = "base"
        args.sigma_style = "DDIM"
        args.norm_eps = False
        args.redesign_sigma = 0
        args.continuous_t = 0
        args.refine_sigma = 0
        args.num_timesteps = args.max_T
    elif m in ("pred_denoise_base", "pred_partial_denoise_base",
               "pred_denoise_base_nonorm", "pred_denoise_base_norefine"):
        args.sampling = "denoise"
        args.sigma_type = "pred_partial" if m == "pred_partial_denoise_base" else "pred"
        args.sigma_style = "DDIM"
        args.norm_eps = m != "pred_denoise_base_nonorm"
        args.redesign_sigma = 0
        args.continuous_t = 0
        args.refine_sigma = 0 if m == "pred_denoise_base_norefine" else 1
        args.num_timesteps = args.max_T
    elif m == "pred_denoise_proj":
        args.sampling = "denoise"
        args.sigma_type = "pred"
        args.sigma_style = "Linear"
        args.norm_eps = True
        args.redesign_sigma = 0
        args.continuous_t = 1
        args.num_timesteps = args.max_T
    elif m == "pred_denoise_proj_arbit":
        args.sampling = "denoise"
        args.sigma_type = "pred"
        args.sigma_style = "Linear"
        args.norm_eps = True
        args.redesign_sigma = 1
        args.continuous_t = 1
        if args.max_T >= 50:
            args.num_timesteps = int(0.8 * args.max_T)
            args.cycle_size = int(0.1 * args.max_T)
        else:
            args.num_timesteps = args.max_T
    elif "pred_proj" in m:
        args.sampling = "project"
        args.sigma_type = "pred"
        args.sigma_style = "Linear"
        args.norm_eps = True
        args.redesign_sigma = 1
        args.continuous_t = 1
    # 'default': leave flags as given

    # global override: base sigma_type forces deterministic denoise settings
    if args.sigma_type == "base":
        args.norm_eps = False
        args.sampling = "denoise"
        args.redesign_sigma = 0
        args.continuous_t = 0
        args.refine_sigma = 0
    else:
        args.norm_eps = True
