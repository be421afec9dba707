"""Metric math golden tests (FID closed form, MMD properties, IPR) and
backbone shape checks."""

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.metrics.cmmd import compute_cmmd, l2_normalize, mmd2_rbf
from psd_tpu.metrics.fid import fid_from_features, frechet_distance
from psd_tpu.metrics.prdc import improved_precision_recall


def test_fid_identical_distributions_is_zero():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 16))
    assert fid_from_features(x, x.copy()) < 1e-6


def test_fid_closed_form_gaussians():
    # For isotropic Gaussians N(m1, s1²I), N(m2, s2²I):
    # FID = ||m1-m2||² + D(s1-s2)²  (exactly, on true params)
    D = 8
    mu1, mu2 = np.zeros(D), np.full(D, 2.0)
    c1, c2 = np.eye(D) * 1.0, np.eye(D) * 4.0
    fid = frechet_distance(mu1, c1, mu2, c2)
    expected = 4.0 * D + D * (1 - 2) ** 2
    np.testing.assert_allclose(fid, expected, rtol=1e-6)


def test_fid_sensitive_to_shift():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1000, 8))
    y_close = rng.normal(size=(1000, 8)) + 0.1
    y_far = rng.normal(size=(1000, 8)) + 2.0
    assert fid_from_features(x, y_close) < fid_from_features(x, y_far)


def test_mmd_properties():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(100, 8)), jnp.float32)
    y_same = jnp.asarray(rng.normal(size=(100, 8)), jnp.float32)
    y_diff = jnp.asarray(rng.normal(size=(100, 8)) + 1.5, jnp.float32)
    m_same = float(mmd2_rbf(x, y_same))
    m_diff = float(mmd2_rbf(x, y_diff))
    assert abs(m_same) < 0.05  # unbiased: near zero for same dist
    assert m_diff > m_same + 0.05
    # matches the reference's torch implementation on the same inputs
    import torch

    def torch_mmd(a, b, sigmas=(0.1, 1.0, 10.0, 100.0)):
        a, b = torch.tensor(np.asarray(a)), torch.tensor(np.asarray(b))
        n, m = a.shape[0], b.shape[0]
        xx = torch.cdist(a, a).pow(2)
        yy = torch.cdist(b, b).pow(2)
        xy = torch.cdist(a, b).pow(2)
        total = 0.0
        for s in sigmas:
            g = 1.0 / (2 * s * s)
            kxx = torch.exp(-g * xx)
            kyy = torch.exp(-g * yy)
            kxy = torch.exp(-g * xy)
            total += float(
                (kxx.sum() - kxx.diagonal().sum()) / (n * (n - 1))
                + (kyy.sum() - kyy.diagonal().sum()) / (m * (m - 1))
                - 2 * kxy.sum() / (n * m)
            )
        return total

    np.testing.assert_allclose(m_diff, torch_mmd(x, y_diff), rtol=1e-3, atol=1e-5)


def test_l2_normalize():
    x = jnp.asarray([[3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(l2_normalize(x)), [[0.6, 0.8]], rtol=1e-6)


def test_ipr_identical_sets_perfect():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(50, 8)).astype(np.float32)
    p, r = improved_precision_recall(x, x.copy(), k=3)
    assert p == 1.0 and r == 1.0


def test_ipr_disjoint_sets_zero():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(50, 8)).astype(np.float32)
    y = rng.normal(size=(50, 8)).astype(np.float32) + 100.0
    p, r = improved_precision_recall(x, y, k=3)
    assert p == 0.0 and r == 0.0


def test_ipr_too_few_samples():
    x = np.zeros((2, 4), np.float32)
    assert improved_precision_recall(x, x, k=3) == (-1.0, -1.0)


def test_backbone_shapes():
    from psd_tpu.models.inception import InceptionV3Features, inception_preprocess
    from psd_tpu.models.resnet import ResNet, ResNetConfig
    from psd_tpu.models.vgg import VGG16Features, imagenet_normalize

    # resnet18 classify + regress heads
    r = ResNet(ResNetConfig(variant="resnet18", num_classes=4))
    x = jnp.zeros((2, 64, 64, 3))
    variables = r.init(jax.random.PRNGKey(0), x)
    out = r.apply(variables, x)
    assert out.shape == (2, 4)
    rr = ResNet(ResNetConfig(variant="resnet18", head="regress"))
    v2 = rr.init(jax.random.PRNGKey(0), x)
    assert rr.apply(v2, x).shape == (2,)

    # vgg features (use eval_shape: full init is slow on CPU)
    vg = VGG16Features()
    shapes = jax.eval_shape(
        lambda k: vg.init(k, jnp.zeros((1, 224, 224, 3))), jax.random.PRNGKey(0)
    )
    out_shape = jax.eval_shape(
        lambda p: vg.apply(p, imagenet_normalize(jnp.zeros((2, 224, 224, 3)))),
        shapes,
    )
    assert out_shape.shape == (2, 4096)

    # inception pool3 2048-d + torchvision param count
    inc = InceptionV3Features()
    pv = jax.eval_shape(
        lambda k: inc.init(k, jnp.zeros((1, 299, 299, 3))), jax.random.PRNGKey(0)
    )
    out_shape = jax.eval_shape(
        lambda p: inc.apply(p, inception_preprocess(jnp.zeros((2, 64, 64, 3)))), pv
    )
    assert out_shape.shape == (2, 2048)
    n = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(pv["params"])
    )
    # torchvision inception_v3 conv/bn trunk: 27,161,264 total − 2,049,000 fc
    # − 3,326,696 aux = 21,785,568
    assert n == 21_785_568, n


def test_fid_scale_homogeneity_degree_2():
    """FID(a·X, a·Y) = a²·FID(X, Y) — the property check_turbo_distribution.py
    relies on when it divides every feature set by one shared RMS constant
    (random-init Inception features are ~1e-5 scale; raw FID rounds to 0)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((64, 16))
    y = rng.standard_normal((64, 16)) + 0.5
    base = fid_from_features(x, y)
    for a in (1e-5, 1e3):
        scaled = fid_from_features(a * x, a * y)
        np.testing.assert_allclose(scaled, a * a * base, rtol=1e-6)
    # and the normalization itself restores readability from tiny features
    tiny = 1e-6
    renorm = np.sqrt(np.mean((tiny * x) ** 2))
    np.testing.assert_allclose(
        fid_from_features(tiny * x / renorm, tiny * y / renorm),
        base / np.mean(x**2), rtol=1e-6)


def test_turbo_variant_parser_compositions():
    """parse_variant must decode every composed turbo token the gates and
    run_bench_suite.sh use (a typo'd sweep would silently gate nothing)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from check_stride_quality import parse_variant

    v = parse_variant("dpm25+tome0.5+deep5")
    assert v["sampler"] == "dpm" and v["steps"] == 25
    assert v["tome"] == 0.5 and v["tome_mode"] == "branch"
    assert v["stride"] == 5 and v["cache_mode"] == "deep"
    v = parse_variant("tomeb0.5+enc3")
    assert v["tome_mode"] == "block" and v["tome"] == 0.5
    assert v["stride"] == 3 and v["cache_mode"] == "encoder"
    v = parse_variant("dpm50")
    assert v["sampler"] == "dpm" and v["steps"] == 50 and v["tome"] == 0.0
