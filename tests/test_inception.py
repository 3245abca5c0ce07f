"""InceptionV3-FID port: shape test + converter key-schema round trip."""
import numpy as np
import jax
import jax.numpy as jnp

from nlc_tpu.eval.inception import InceptionV3FID, convert_inception


def test_inception_shapes():
    model = InceptionV3FID()
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    assert feats.shape == (2, 2048)


def test_converter_covers_full_key_schema():
    """Build a torchvision-style state dict from the flax tree (inverse
    mapping), convert it back, and check the model accepts it — proving the
    converter touches every parameter with the right names/shapes."""
    model = InceptionV3FID()
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)

    sd = {}

    def walk(tree, path, collection):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + [k], collection)
            else:
                mods = ".".join(path[:-1])
                layer = path[-1]
                arr = np.asarray(v)
                if layer == "conv" and k == "kernel":
                    sd[f"{mods}.conv.weight"] = np.transpose(arr, (3, 2, 0, 1))
                elif layer == "bn":
                    name = {"scale": "weight", "bias": "bias",
                            "mean": "running_mean", "var": "running_var"}[k]
                    sd[f"{mods}.bn.{name}"] = arr

    walk(variables["params"], [], "params")
    walk(variables["batch_stats"], [], "stats")
    # spoof the extra torchvision keys the converter must skip
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    sd["Mixed_5b.branch1x1.bn.num_batches_tracked"] = np.zeros((), np.int64)

    converted = convert_inception(sd)
    # structural equality with the original tree
    orig_paths = {tuple(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(variables)[0]}
    conv_paths = {tuple(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert orig_paths == conv_paths
    feats = model.apply(converted, x)
    assert feats.shape == (1, 2048)


def test_feature_distribution_sensitivity():
    """Even random-weight inception separates distinct distributions (sanity
    of the FID plumbing; real numbers need the pretrained checkpoint)."""
    from nlc_tpu.eval.fid import compute_statistics, frechet_distance
    model = InceptionV3FID()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    fn = jax.jit(lambda x: model.apply(variables, x))
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(16, 32, 32, 3), jnp.float32)
    b = jnp.asarray(rng.rand(16, 32, 32, 3), jnp.float32)
    c = jnp.asarray(rng.rand(16, 32, 32, 3) * 0.2, jnp.float32)
    fa, fb, fc = (np.asarray(fn(v)) for v in (a, b, c))
    d_same = frechet_distance(*compute_statistics(fa), *compute_statistics(fb))
    d_diff = frechet_distance(*compute_statistics(fa), *compute_statistics(fc))
    assert d_diff > d_same


# ---------------------------------------------------------------------------
# Numerical golden (VERDICT r3 #3): torchvision/pytorch_fid are not in this
# image, but torch is — so the FID-variant architecture (BasicConv2d =
# conv+BN(eps=1e-3)+relu; InceptionA/C/E_1 with count_include_pad=False
# average pooling; InceptionE_2 with the max-pool branch) is restated below
# in plain torch, following pytorch_fid/inception.py + torchvision
# inception_v3 (the exact network src/experiments.py:210-226 loads), and the
# flax port + converter are anchored against it on shared random weights.

def _torch_fid_inception():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class BasicConv2d(nn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = nn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    def avgp(x):  # the pytorch_fid modification
        return F.avg_pool2d(x, kernel_size=3, stride=1, padding=1,
                            count_include_pad=False)

    class IncA(nn.Module):
        def __init__(self, cin, pool_features):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
            self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
            self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

        def forward(self, x):
            import torch
            b1 = self.branch1x1(x)
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = self.branch_pool(avgp(x))
            return torch.cat([b1, b5, bd, bp], 1)

    class IncB(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            import torch
            import torch.nn.functional as F
            b3 = self.branch3x3(x)
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = F.max_pool2d(x, kernel_size=3, stride=2)
            return torch.cat([b3, bd, bp], 1)

    class IncC(nn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            import torch
            b1 = self.branch1x1(x)
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
            bp = self.branch_pool(avgp(x))
            return torch.cat([b1, b7, bd, bp], 1)

    class IncD(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            import torch
            import torch.nn.functional as F
            b3 = self.branch3x3_2(self.branch3x3_1(x))
            b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x))))
            bp = F.max_pool2d(x, kernel_size=3, stride=2)
            return torch.cat([b3, b7, bp], 1)

    class IncE(nn.Module):
        def __init__(self, cin, pool_mode):
            super().__init__()
            self.pool_mode = pool_mode
            self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
            self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
            self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            import torch
            import torch.nn.functional as F
            b1 = self.branch1x1(x)
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            if self.pool_mode == "max":   # FIDInceptionE_2
                bp = F.max_pool2d(x, kernel_size=3, stride=1, padding=1)
            else:                          # FIDInceptionE_1
                bp = avgp(x)
            bp = self.branch_pool(bp)
            return torch.cat([b1, b3, bd, bp], 1)

    class TorchFIDInception(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
            self.Mixed_5b = IncA(192, 32)
            self.Mixed_5c = IncA(256, 64)
            self.Mixed_5d = IncA(288, 64)
            self.Mixed_6a = IncB(288)
            self.Mixed_6b = IncC(768, 128)
            self.Mixed_6c = IncC(768, 160)
            self.Mixed_6d = IncC(768, 160)
            self.Mixed_6e = IncC(768, 192)
            self.Mixed_7a = IncD(768)
            self.Mixed_7b = IncE(1280, "avg")
            self.Mixed_7c = IncE(2048, "max")

        def forward(self, x, resize=True):
            import torch.nn.functional as F
            if resize:
                x = F.interpolate(x, size=(299, 299), mode="bilinear",
                                  align_corners=False)
            x = 2 * x - 1
            x = self.Conv2d_1a_3x3(x)
            x = self.Conv2d_2a_3x3(x)
            x = self.Conv2d_2b_3x3(x)
            x = F.max_pool2d(x, kernel_size=3, stride=2)
            x = self.Conv2d_3b_1x1(x)
            x = self.Conv2d_4a_3x3(x)
            x = F.max_pool2d(x, kernel_size=3, stride=2)
            for m in [self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                      self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                      self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                      self.Mixed_7b, self.Mixed_7c]:
                x = m(x)
            return x.mean(dim=(2, 3))

    return TorchFIDInception()


def _randomize_torch_inception(model, seed=0):
    """Fill conv/BN params and BN running stats with seeded, depth-stable
    random values (unit-ish activations so fp32 comparison stays tight)."""
    import torch
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.Conv2d):
                fan_in = m.weight.shape[1] * m.weight.shape[2] * m.weight.shape[3]
                m.weight.normal_(0.0, (2.0 / fan_in) ** 0.5, generator=g)
            elif isinstance(m, torch.nn.BatchNorm2d):
                m.weight.uniform_(0.8, 1.2, generator=g)
                m.bias.normal_(0.0, 0.05, generator=g)
                m.running_mean.normal_(0.0, 0.05, generator=g)
                m.running_var.uniform_(0.7, 1.3, generator=g)
    return model


def test_inception_features_match_torch_fid_network():
    """Numerical golden for the whole 2048-d feature pipeline: the flax port
    + convert_inception vs the plain-torch FID-Inception on identical
    random weights — both the direct 299x299 path and the bilinear-resize
    path the extractor actually runs on model samples."""
    import pytest
    torch = pytest.importorskip("torch")

    tm = _randomize_torch_inception(_torch_fid_inception()).eval()
    variables = convert_inception(
        {k: v.detach().numpy() for k, v in
         {**dict(tm.named_parameters()), **dict(tm.named_buffers())}.items()})

    model = InceptionV3FID()
    rng = np.random.RandomState(0)
    for size in (299, 75):
        x = rng.rand(2, size, size, 3).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ours = np.asarray(model.apply(variables, jnp.asarray(x)))
        scale = np.abs(ref).max()
        err = np.abs(ours - ref).max()
        assert err <= 1e-4 * max(scale, 1.0) + 1e-5, \
            f"size={size}: max|diff|={err:.2e} vs scale {scale:.2e}"
