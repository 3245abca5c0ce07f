"""nlc_tpu — a TPU-native (JAX/XLA/Pallas/pjit) noise-level-corrected diffusion framework.

Reimplements the capabilities of Walleclipse/Diffusion-NLC (TMLR 2025,
arXiv 2412.05488) as a brand-new JAX framework: NLC sampling (DDPM / DDIM /
EDM-Heun with a sigma-correction head reading frozen-UNet features), sigma-head
training against frozen ADM / DDIM / EDM backbones, and constrained generation
for image restoration via SVD-factored degradation operators.

Layer map (mirrors reference SURVEY.md §1, rebuilt TPU-first):

    cli/        entry points (image_sample, edm_image_sample, trainers, evaluater)
    engine/     sampling + training engines (lax.scan denoising loops)
    sched/      noise schedules, timestep grids, sampler step rules
    models/     Flax UNets (ddim, adm, song) + sigma heads, NHWC layout
    ops/        Pallas TPU kernels (fused attention, ...)
    operators/  SVD degradation operators (A, A+, Lambda) as pytrees
    restoration/ NAFNet-family restoration CNNs + their trainer (basicsr parity)
    parallel/   mesh construction, sharding specs, multi-host init
    data/       datasets and input pipelines
    train/      sigma-model / EDM trainers (optax + EMA)
    eval/       FID / PSNR / SSIM / NIQE metrics
    io/         orbax checkpoints + torch-checkpoint converters
    utils/      rng streams, norms, KV logger, image io
"""

__version__ = "0.1.0"
