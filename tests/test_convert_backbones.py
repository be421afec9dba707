"""Backbone converter tests: synthetic torchvision-shaped state dicts must
convert to trees matching our models' init shapes leaf-for-leaf."""

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.convert.backbones import (
    convert_inception_v3,
    convert_resnet,
    convert_vgg16,
)
from psd_tpu.convert.sd import verify_params_match
from psd_tpu.models.inception import InceptionV3Features
from psd_tpu.models.resnet import ResNet, ResNetConfig
from psd_tpu.models.vgg import VGG16Features


def _synth_resnet18_sd():
    """Exact torchvision resnet18 key/shape enumeration."""
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, i, o, k):
        sd[name + ".weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32)

    def bn(name, c):
        for suffix, val in [("weight", np.ones(c)), ("bias", np.zeros(c)),
                            ("running_mean", np.zeros(c)),
                            ("running_var", np.ones(c))]:
            sd[f"{name}.{suffix}"] = val.astype(np.float32)

    conv("conv1", 3, 64, 7)
    bn("bn1", 64)
    cin = 64
    for li, (n_blocks, width) in enumerate(zip([2, 2, 2, 2], [64, 128, 256, 512])):
        for bi in range(n_blocks):
            base = f"layer{li + 1}.{bi}"
            stride_in = cin if bi == 0 else width
            conv(f"{base}.conv1", stride_in, width, 3)
            bn(f"{base}.bn1", width)
            conv(f"{base}.conv2", width, width, 3)
            bn(f"{base}.bn2", width)
            if stride_in != width:
                conv(f"{base}.downsample.0", stride_in, width, 1)
                bn(f"{base}.downsample.1", width)
        cin = width
    sd["fc.weight"] = rng.normal(size=(1000, 512)).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    return sd


def test_resnet18_conversion():
    sd = _synth_resnet18_sd()
    converted = convert_resnet(sd, keep_fc=False)
    model = ResNet(ResNetConfig(variant="resnet18", head="features"))
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 3))), jax.random.PRNGKey(0)
    )
    verify_params_match(converted["params"], shapes["params"])
    # batch_stats tree must align too
    verify_params_match(converted["batch_stats"], shapes["batch_stats"])


def _synth_vgg16_sd():
    rng = np.random.default_rng(1)
    sd = {}
    layout = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]
    tv_idx = 0
    cin = 3
    for item in layout:
        if item == "M":
            tv_idx += 1
            continue
        sd[f"features.{tv_idx}.weight"] = rng.normal(
            size=(item, cin, 3, 3)).astype(np.float32)
        sd[f"features.{tv_idx}.bias"] = np.zeros(item, np.float32)
        cin = item
        tv_idx += 2  # conv + relu
    sd["classifier.0.weight"] = rng.normal(size=(4096, 512 * 7 * 7)).astype(np.float32)
    sd["classifier.0.bias"] = np.zeros(4096, np.float32)
    sd["classifier.3.weight"] = rng.normal(size=(4096, 4096)).astype(np.float32)
    sd["classifier.3.bias"] = np.zeros(4096, np.float32)
    sd["classifier.6.weight"] = rng.normal(size=(1000, 4096)).astype(np.float32)
    sd["classifier.6.bias"] = np.zeros(1000, np.float32)
    return sd


def test_vgg16_conversion():
    sd = _synth_vgg16_sd()
    converted = convert_vgg16(sd)
    model = VGG16Features()
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 224, 224, 3))), jax.random.PRNGKey(0)
    )
    verify_params_match(converted["params"], shapes["params"])


def test_inception_conversion_structurally():
    """Build the synthetic torchvision inception sd FROM our init shapes
    (inverse mapping), then verify the forward mapping round-trips."""
    model = InceptionV3Features()
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 299, 299, 3))), jax.random.PRNGKey(0)
    )
    rng = np.random.default_rng(2)
    sd = {}

    def walk(tree, path):
        for k, v in tree.items():
            p = path + [k]
            if isinstance(v, dict):
                walk(v, p)
                continue
            # p like [...block..., "conv", "kernel"] or [..., "bn", "scale"]
            mod = ".".join(p[:-2])
            leaf_mod, leaf = p[-2], p[-1]
            if leaf_mod == "conv":
                kh, kw, ci, co = v.shape
                sd[f"{mod}.conv.weight"] = rng.normal(
                    size=(co, ci, kh, kw)).astype(np.float32)
            elif leaf_mod == "bn" and leaf == "scale":
                c = v.shape[0]
                sd[f"{mod}.bn.weight"] = np.ones(c, np.float32)
                sd[f"{mod}.bn.bias"] = np.zeros(c, np.float32)
                sd[f"{mod}.bn.running_mean"] = np.zeros(c, np.float32)
                sd[f"{mod}.bn.running_var"] = np.ones(c, np.float32)

    walk(shapes["params"], [])
    sd["fc.weight"] = rng.normal(size=(1000, 2048)).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    converted = convert_inception_v3(sd)
    verify_params_match(converted["params"], shapes["params"])
    verify_params_match(converted["batch_stats"], shapes["batch_stats"])
