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
