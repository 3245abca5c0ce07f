"""50-step 64x64 full-loop goldens vs the torch reference for EVERY method
preset (image_sample.py:183-268) on converted random weights, asserting both
final-output parity and per-step trajectory drift bounds.

Covers: base / pred_denoise_base / pred_partial_denoise_base /
pred_denoise_base_nonorm / pred_denoise_base_norefine (DDIM grid),
pred_denoise_proj (Linear grid + continuous t), pred_denoise_proj_arbit
(redesign-sigma tail, 50 steps over a 40-step grid), pred_proj (projection
loop), and learned-variance ADM runs (base + pred). eta=0 keeps the loops
deterministic so the comparison is exact rather than statistical
(SURVEY.md §7 hard part #2).
"""
import math
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import requires_reference
from tests.test_engine import _stub_missing_reference_deps

from nlc_tpu.models.ddim_unet import DDIMUNet, DDIMUNetConfig
from nlc_tpu.models.sigma_head import SigmaHead, sigma_head_for_unet
from nlc_tpu.io.torch_convert import convert_ddim_unet, convert_sigma_head
from nlc_tpu.sched import get_sampler
from nlc_tpu.sched.redesign import redesign_sigma_tail
from nlc_tpu.engine import (DenoiseConfig, ModelBundle, denoise_loop,
                            projection_loop)
from nlc_tpu.engine.loops import set_norm_maxmin

CFG64 = DDIMUNetConfig(ch=32, out_ch=3, ch_mult=(1, 2, 2), num_res_blocks=1,
                       attn_resolutions=(16,), resolution=64)
STEPS = 50
BATCH = 2

PRESETS = {
    # name -> (style, norm_eps, refine, sigma_style, continuous_t, start_sigma)
    #
    # start_sigma=2.0 on the unrefined 'pred' combos: at the DDIM grid's
    # sigma_0 ~ 157, x0 = clip(xt - sigma * normalized_eps) saturates into a
    # pure +-1 SIGN pattern of the (random) eps-net output, and sign flips
    # make the 50-step recursion a discrete chaotic map — no cross-framework
    # parity is observable (the reference diverges from itself under any
    # perturbation there; trained heads are contractive). A low-sigma grid
    # keeps x0 in-range so the same flag paths compare smoothly; the
    # high-sigma grid family is covered by the refine-gated presets above.
    "base": ("base", False, False, "DDIM", False, None),
    "pred_denoise_base": ("pred", True, True, "DDIM", False, None),
    "pred_partial_denoise_base": ("pred_partial", True, True, "DDIM", False,
                                  None),
    "pred_denoise_base_nonorm": ("pred", False, True, "DDIM", False, None),
    "pred_denoise_base_norefine": ("pred", True, False, "Linear", False, 2.0),
    "pred_denoise_proj": ("pred", True, True, "Linear", True, 2.0),
}


@pytest.fixture(scope="module")
def ddim64(reference_path):
    import torch
    _stub_missing_reference_deps()
    from src.unet_simple import Model as TorchModel, SigmaModel as TorchSigma

    cfgm = types.SimpleNamespace(ch=32, out_ch=3, ch_mult=[1, 2, 2],
                                 num_res_blocks=1, attn_resolutions=[16],
                                 dropout=0.0, in_channels=3,
                                 resamp_with_conv=True, type="simple",
                                 feat_layer=0)
    tcfg = types.SimpleNamespace(
        model=cfgm, data=types.SimpleNamespace(image_size=64),
        diffusion=types.SimpleNamespace(num_diffusion_timesteps=1000))
    torch.manual_seed(0)
    tm = TorchModel(tcfg).eval()
    with torch.no_grad():
        # A full-strength RANDOM eps-net makes the 50-step recursion chaotic:
        # measured drift explodes from 7.6e-4 (step 0) to 0.5 by step 25 at
        # scale 1.0 (amplification ~2.5x/step through the net's Jacobian —
        # trained denoisers are contractive, random ones are not), and the
        # discrete sigma->t staircase in the 'pred' styles injects ~1e-3
        # jumps whenever sigma_hat lands near a table boundary. Float32
        # cross-framework parity is only observable in the stable regime, so
        # the output conv is scaled to 0.1 where injected differences decay
        # instead of compounding; every step's table lookups, style gates
        # and clips still execute with active clamping (sigma_0 ~ 157 makes
        # |sigma*eps| >> 1).
        tm.conv_out.weight.mul_(0.1)
        tm.conv_out.bias.mul_(0.1)
    d, _, ch = CFG64.feat_shape
    tsig = TorchSigma(dim=d, channels=ch, n_blocks=2, out_dim=1,
                      dropout=0.0).eval()
    with torch.no_grad():
        tsig.train()
        for _ in range(2):
            tsig(torch.randn(8, ch, d, d))
        tsig.eval()
        # keep corrections small so 50 steps of compounding stays in the
        # well-conditioned regime (the trained head's operating point)
        tsig.final_mlp.weight.mul_(0.05)
        tsig.final_mlp.bias.fill_(0.01)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {"params": convert_ddim_unet(sd, CFG64)}
    ssd = {k: v.detach().numpy() for k, v in tsig.state_dict().items()}
    hcfg = sigma_head_for_unet(CFG64.feat_shape, n_blocks=2)
    sp, sbs = convert_sigma_head(ssd, hcfg)
    svars = {"params": sp, "batch_stats": sbs}
    model = DDIMUNet(CFG64)
    head = SigmaHead(hcfg)
    bundle = ModelBundle(
        forward=lambda p, z, t: model.apply(p, z, t),
        encode=lambda p, z, t: model.apply(p, z, t, method=DDIMUNet.encode),
        sigma=lambda v, f: head.apply(v, f),
        learn_epsvar=False)
    return tm, tsig, params, svars, bundle


def _torch_experiment(tm, tsig, sampler):
    from src.experiments import ImageExperiment
    exp = ImageExperiment(tm, sampler, batch_size=BATCH,
                          data_shape=(3, 64, 64), seed=0, device="cpu",
                          save_folder="/tmp")
    exp.set_model(tm, tsig, learn_epsvar=False)
    exp.set_norm_maxmin(-2.0, 60.0)
    exp.set_clip_fn("clamp")
    return exp


def _our_cfg(style, norm_eps, refine, **kw):
    nmin, nmax = set_norm_maxmin((64, 64, 3), -2.0, 60.0)
    return DenoiseConfig(style=style, norm_eps=norm_eps,
                         refine_prior_sigma=refine, clip_fn="clamp",
                         sigma_pred_threshold=960, norm_max=nmax,
                         norm_min=nmin, return_log=True, **kw)


def _xT():
    return np.random.RandomState(7).randn(BATCH, 3, 64, 64).astype(np.float32) * 3


def _assert_trajectory(logs, ref_lists, steps, final, ref_final, label):
    """Final parity + bounded per-step drift of the pre-clip x0 trajectory."""
    np.testing.assert_allclose(
        np.transpose(np.asarray(final), (0, 3, 1, 2)), ref_final,
        atol=1e-2, rtol=1e-2, err_msg=label)
    x0_prec = np.asarray(logs["x0_prec"])          # (steps, B, H, W, C)
    ref_x0 = np.stack([x.numpy() for x in ref_lists[2]])
    ours_nchw = np.transpose(x0_prec, (0, 1, 4, 2, 3))
    assert ours_nchw.shape == ref_x0.shape == (steps, BATCH, 3, 64, 64)
    drift = np.abs(ours_nchw - ref_x0).reshape(steps, -1).max(axis=1)
    # fp32 framework differences accumulate step to step; in the stable
    # regime they must stay bounded, not grow (chaotic growth would hit
    # ~2.0 within ten steps — see the ddim64 fixture comment); the bound
    # leaves room for one discrete sigma->t staircase flip
    assert drift.max() < 2e-2, (label, drift.max(), drift.argmax())


@requires_reference
@pytest.mark.parametrize("preset", sorted(PRESETS))
def test_50step_preset_matches_torch(ddim64, preset):
    import torch
    from src.schedulers import get_sampler as torch_get_sampler
    tm, tsig, params, svars, bundle = ddim64
    style, norm_eps, refine, sigma_style, continuous, start_sigma = \
        PRESETS[preset]

    tsampler = torch_get_sampler("ddim_simple_orig", 1000, STEPS,
                                 sigma_style=sigma_style,
                                 sampler_var="fixedsmall", eta=0.0,
                                 continuous_t=continuous,
                                 start_sigma=start_sigma)
    exp = _torch_experiment(tm, tsig, tsampler)
    xT_np = _xT()
    with torch.no_grad():
        ref_out, ref_lists = exp.denoise_loop(
            shape=(BATCH, 3, 64, 64), xT=torch.from_numpy(xT_np), style=style,
            norm_eps=norm_eps, refine_prior_sigma=refine, return_log=True,
            chunk_size=1, sigma_pred_threshold=960, return_best=True)

    s = get_sampler("ddim_simple_orig", 1000, STEPS, sigma_style=sigma_style,
                    sampler_var="fixedsmall", eta=0.0, continuous_t=continuous,
                    start_sigma=start_sigma)
    cfg = _our_cfg(style, norm_eps, refine)
    xT = jnp.asarray(np.transpose(xT_np, (0, 2, 3, 1)))
    out, logs = denoise_loop(s, bundle, cfg, params, svars, xT,
                             jnp.arange(BATCH))
    _assert_trajectory(logs, ref_lists, STEPS, out, ref_out.numpy(), preset)


@requires_reference
def test_50step_redesign_tail_matches_torch(ddim64):
    """pred_denoise_proj_arbit: 50 total steps over a 40-step Linear grid
    with the cyclical log-space sigma tail (image_sample.py:788-800)."""
    import torch
    from src.schedulers import get_sampler as torch_get_sampler
    tm, tsig, params, svars, bundle = ddim64
    num_ts, max_T, cycle = 40, STEPS, 5
    min_sigma, max_sigma, gamma = 0.003, 0.02, 1.0

    tsampler = torch_get_sampler("ddim_simple_orig", 1000, num_ts,
                                 sigma_style="Linear",
                                 sampler_var="fixedsmall", eta=0.0,
                                 continuous_t=True, start_sigma=2.0)
    # reference redesign block (image_sample.py:788-800), verbatim semantics
    tsampler.continuous_t = True
    iters = np.arange(max_T - num_ts)
    cyc = np.floor(1 + iters / cycle)
    xfrac = np.abs(iters / cycle - cyc + 1)
    sig_res = np.log(min_sigma) + (np.log(max_sigma) - np.log(min_sigma)) \
        * np.maximum(0, 1 - xfrac) * gamma ** (cyc - 1)
    sig_res = torch.tensor(np.exp(sig_res))
    tsampler.sampling_sigmas = torch.cat(
        [torch.clamp(tsampler.sampling_sigmas[:-1], min=min_sigma), sig_res])
    tsampler.timesteps = tsampler.get_t_from_sigma(tsampler.sampling_sigmas)
    tsampler.timesteps = torch.cat([tsampler.timesteps, torch.tensor([-1])])
    tsampler.sampling_sigmas = torch.cat(
        [tsampler.sampling_sigmas, torch.tensor([tsampler.final_sigma])])

    exp = _torch_experiment(tm, tsig, tsampler)
    xT_np = _xT()
    with torch.no_grad():
        ref_out, ref_lists = exp.denoise_loop(
            shape=(BATCH, 3, 64, 64), xT=torch.from_numpy(xT_np),
            style="pred", norm_eps=True, refine_prior_sigma=True,
            return_log=True, chunk_size=1, sigma_pred_threshold=960)

    s = get_sampler("ddim_simple_orig", 1000, num_ts, sigma_style="Linear",
                    sampler_var="fixedsmall", eta=0.0, continuous_t=True,
                    start_sigma=2.0)
    s = redesign_sigma_tail(s, max_T, num_ts, min_sigma, max_sigma, gamma,
                            cycle)
    np.testing.assert_allclose(np.asarray(s.sampling_sigmas),
                               tsampler.sampling_sigmas.numpy(), rtol=1e-5)
    cfg = _our_cfg("pred", True, True)
    xT = jnp.asarray(np.transpose(xT_np, (0, 2, 3, 1)))
    out, logs = denoise_loop(s, bundle, cfg, params, svars, xT,
                             jnp.arange(BATCH))
    _assert_trajectory(logs, ref_lists, STEPS, out, ref_out.numpy(),
                       "redesign_tail")


@requires_reference
def test_50step_projection_loop_matches_torch(ddim64):
    """pred_proj: the sigma-driven projection loop (image_sample.py:430-519)
    run 50 steps with the 4-rate sigma estimate."""
    import torch
    import importlib.util
    from src.schedulers import get_sampler as torch_get_sampler
    tm, tsig, params, svars, bundle = ddim64

    if "cv2" not in sys.modules:        # image_sample imports basicsr metrics
        cv2 = types.ModuleType("cv2")
        cv2.resize = lambda a, *x, **k: a
        cv2.INTER_LINEAR = 1
        cv2.cvtColor = lambda a, *x, **k: a
        cv2.COLOR_BGR2GRAY = 0
        cv2.getGaussianKernel = lambda n, s: np.ones((n, 1)) / n
        cv2.filter2D = lambda a, *x, **k: a
        sys.modules["cv2"] = cv2
    if "skimage" not in sys.modules:   # basicsr.metrics.psnr_ssim import
        sk = types.ModuleType("skimage")
        skm = types.ModuleType("skimage.metrics")
        skm.structural_similarity = lambda *a, **k: 0.0
        sk.metrics = skm
        sys.modules["skimage"] = sk
        sys.modules["skimage.metrics"] = skm
    # image_sample.py imports the reference datasets package, which pulls
    # torchvision submodules this image lacks; the projection loop under
    # test never touches them
    stub_mods = [
        ("torchvision.transforms", ("Compose", "Resize",
                                    "RandomHorizontalFlip", "ToTensor",
                                    "CenterCrop")),
        ("torchvision.transforms.functional", ()),
        ("torchvision.datasets", ()),
        ("torchvision.datasets.utils", ("verify_str_arg",
                                        "iterable_to_str"))]
    # later reference imports through these stubs (e.g. clip.py's
    # Normalize / InterpolationMode.BICUBIC) must not break on names this
    # test didn't anticipate: any attribute resolves to a permissive dummy
    class _AnyStub:
        def __call__(self, *a, **k):
            return self

        def __getattr__(self, _):
            return self
    _any = _AnyStub()
    for name, attrs in stub_mods:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for a in attrs:
                setattr(mod, a, lambda *x, **k: None)
            mod.__getattr__ = lambda a, _any=_any: _any   # PEP 562
            sys.modules[name] = mod
            parent, _, child = name.rpartition(".")
            if parent in sys.modules:
                setattr(sys.modules[parent], child, mod)
    spec = importlib.util.spec_from_file_location(
        "ref_image_sample", "/root/reference/image_sample.py")
    ref_is = importlib.util.module_from_spec(spec)
    sys.modules["ref_image_sample"] = ref_is
    spec.loader.exec_module(ref_is)

    tsampler = torch_get_sampler("ddim_simple_orig", 1000, STEPS,
                                 sigma_style="Linear",
                                 sampler_var="fixedsmall", eta=0.0,
                                 continuous_t=True, start_sigma=2.0)
    exp = _torch_experiment(tm, tsig, tsampler)
    xT_np = _xT()
    rate = [0.7, 0.3, 0.0, 0.0]
    with torch.no_grad():
        ref_out, _ = ref_is.projection_loop(
            exp, shape=(BATCH, 3, 64, 64), xT=torch.from_numpy(xT_np),
            style="pred", norm_eps=True, refine_prior_sigma=True,
            return_log=True, chunk_size=1, sigma_estimate_rate=rate,
            max_T=STEPS, sigma_pred_threshold=960)

    s = get_sampler("ddim_simple_orig", 1000, STEPS, sigma_style="Linear",
                    sampler_var="fixedsmall", eta=0.0, continuous_t=True,
                    start_sigma=2.0)
    cfg = _our_cfg("pred", True, True, sigma_estimate_rate=tuple(rate),
                   max_T=STEPS)
    xT = jnp.asarray(np.transpose(xT_np, (0, 2, 3, 1)))
    out, logs = projection_loop(s, bundle, cfg, params, svars, xT,
                                jnp.arange(BATCH))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref_out.numpy(), atol=2e-2, rtol=2e-2)


@requires_reference
@pytest.mark.parametrize("style", ["base", "pred"])
def test_50step_adm_learned_variance_matches_torch(reference_path, style):
    """Learned-variance path at 50 steps / 64x64 on the ADM backbone (both
    variance modes of the preset grid: the DDIM tests above are fixedsmall,
    these are learned)."""
    import torch
    _stub_missing_reference_deps()
    from src.unet_adm import UNetModel as TorchUNet, SigmaModel as TorchSigma
    from src.schedulers import get_sampler as torch_get_sampler
    from src.experiments import ImageExperiment
    from nlc_tpu.models.adm_unet import ADMUNet, ADMUNetConfig, ADMSigmaHead
    from nlc_tpu.io.adm_convert import convert_adm_unet, convert_adm_sigma_head

    torch.manual_seed(0)
    acfg = ADMUNetConfig(image_size=64, model_channels=32, out_channels=6,
                         num_res_blocks=1, attention_resolutions=(4,),
                         channel_mult=(1, 2), num_heads=2,
                         use_scale_shift_norm=True, feat_layer=1)
    tm = TorchUNet(image_size=64, in_channels=3, model_channels=32,
                   out_channels=6, num_res_blocks=1, attention_resolutions=(4,),
                   dropout=0.0, channel_mult=(1, 2), num_classes=None,
                   use_checkpoint=False, use_fp16=False, num_heads=2,
                   num_head_channels=-1, num_heads_upsample=-1,
                   use_scale_shift_norm=True, resblock_updown=False,
                   use_new_attention_order=False, feat_layer=1).eval()
    d, _, ch = acfg.feat_shape
    tsig = TorchSigma(dim=d, channels=ch, n_blocks=2, out_dim=1, dropout=0.0,
                      num_heads=2).eval()
    with torch.no_grad():
        tsig.train()
        for _ in range(2):
            tsig(torch.randn(8, ch, d, d))
        tsig.eval()
        tsig.final_mlp.weight.mul_(0.01)
        tsig.final_mlp.bias.fill_(0.01)
        # ADM's output conv is zero-initialized (nn_util.zero_module) -> a
        # raw random net would predict eps=0 and test nothing; give it a
        # small random output so all 50 steps carry signal (stable regime,
        # see ddim64 fixture comment)
        tm.out[2].weight.normal_(0, 0.008)
        tm.out[2].bias.normal_(0, 0.008)

    # pred runs continuous_t: with discrete t the refined sigma->t lookup is
    # a staircase, and one fp-level boundary flip mid-run (measured at step
    # 31: drift 1e-5 -> 7e-3, then linear growth) forks the two frameworks
    # onto different-but-valid trajectories; the discrete-t pred paths are
    # covered by the DDIM preset grid above
    cont = style == "pred"
    tsampler = torch_get_sampler("ddim_simple_orig", 1000, STEPS,
                                 sigma_style="Linear", sampler_var="learned",
                                 eta=0.0, continuous_t=cont,
                                 start_sigma=2.0 if style == "pred" else None)
    exp = ImageExperiment(tm, tsampler, batch_size=BATCH,
                          data_shape=(3, 64, 64), seed=0, device="cpu",
                          save_folder="/tmp")
    exp.set_model(tm, tsig, learn_epsvar=True)
    exp.set_norm_maxmin(-2.0, 60.0)
    exp.set_clip_fn("clamp")
    xT_np = _xT()
    with torch.no_grad():
        ref_out, ref_lists = exp.denoise_loop(
            shape=(BATCH, 3, 64, 64), xT=torch.from_numpy(xT_np), style=style,
            norm_eps=(style != "base"), refine_prior_sigma=(style != "base"),
            return_log=True, chunk_size=1, sigma_pred_threshold=960)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {"params": convert_adm_unet(sd, acfg)}
    ssd = {k: v.detach().numpy() for k, v in tsig.state_dict().items()}
    sp, sbs = convert_adm_sigma_head(ssd, d, ch, 2)
    svars = {"params": sp, "batch_stats": sbs}
    model = ADMUNet(acfg)
    head = ADMSigmaHead(dim=d, channels=ch, n_blocks=2, dropout=0.0,
                        num_heads=2)
    bundle = ModelBundle(
        forward=lambda p, z, t: model.apply(p, z, t),
        encode=lambda p, z, t: model.apply(p, z, t, method=ADMUNet.encode),
        sigma=lambda v, f: head.apply(v, f),
        learn_epsvar=True)
    s = get_sampler("ddim_simple_orig", 1000, STEPS, sigma_style="Linear",
                    sampler_var="learned", eta=0.0, continuous_t=cont,
                    start_sigma=2.0 if style == "pred" else None)
    nmin, nmax = set_norm_maxmin((64, 64, 3), -2.0, 60.0)
    cfg = DenoiseConfig(style=style, norm_eps=(style != "base"),
                        refine_prior_sigma=(style != "base"), clip_fn="clamp",
                        sigma_pred_threshold=960, norm_max=nmax, norm_min=nmin,
                        return_log=True)
    xT = jnp.asarray(np.transpose(xT_np, (0, 2, 3, 1)))
    out, logs = denoise_loop(s, bundle, cfg, params, svars, xT,
                             jnp.arange(BATCH))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref_out.numpy(), atol=3e-2, rtol=3e-2,
                               err_msg=style)
    x0_prec = np.transpose(np.asarray(logs["x0_prec"]), (0, 1, 4, 2, 3))
    ref_x0 = np.stack([x.numpy() for x in ref_lists[2]])
    drift = np.abs(x0_prec - ref_x0).reshape(STEPS, -1).max(axis=1)
    assert drift.max() < 8e-2, (style, drift.max())
