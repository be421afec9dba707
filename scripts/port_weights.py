"""One-shot torch→JAX weight porting CLI (SURVEY.md §2.3 pretrained surface).

Reads diffusers/transformers/torchvision checkpoint files (.safetensors or
torch .bin) from LOCAL paths (zero-egress environment: download elsewhere,
mount here) and writes our .npz param trees, verified leaf-for-leaf against
the target model's init shapes before saving.

  python scripts/port_weights.py --kind unet --src .../unet/diffusion_pytorch_model.safetensors --out weights/unet.npz
  python scripts/port_weights.py --kind vae  --src .../vae/...               --out weights/vae.npz
  python scripts/port_weights.py --kind clip --src .../clip_vision.bin       --out weights/clip.npz
  python scripts/port_weights.py --kind resnet18|vgg16|inception --src ... --out ...
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from psd_tpu.convert.io import save_params_npz  # noqa: E402
from psd_tpu.convert.sd import load_torch_state_dict, verify_params_match  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True,
                   choices=["unet", "unet_split3", "vae", "clip", "resnet18",
                            "resnet34", "resnet50", "resnet101", "vgg16",
                            "inception"])
    p.add_argument("--src", required=True, help="torch checkpoint file")
    p.add_argument("--out", required=True, help="output .npz")
    p.add_argument("--no-verify", action="store_true")
    args = p.parse_args(argv)

    sd = load_torch_state_dict(args.src)
    print(f"loaded {len(sd)} tensors from {args.src}")

    if args.kind in ("unet", "unet_split3"):
        from psd_tpu.convert.sd import convert_sd_unet
        from psd_tpu.models.unet import UNet2DCondition, sd14_unet_config

        split3 = args.kind == "unet_split3"
        converted = convert_sd_unet(sd, warm_start_kv_dis=split3)
        if not args.no_verify:
            model = UNet2DCondition(
                sd14_unet_config(attn_mode="split3" if split3 else "plain")
            )
            shapes = jax.eval_shape(
                lambda k: model.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                                     jnp.zeros((1, 48, 768)), 0.0),
                jax.random.PRNGKey(0),
            )
            verify_params_match(converted["params"], shapes["params"])
    elif args.kind == "vae":
        from psd_tpu.convert.sd import convert_sd_vae
        from psd_tpu.models.vae import AutoencoderKL, sd_vae_config

        converted = convert_sd_vae(sd)
        if not args.no_verify:
            vae = AutoencoderKL(sd_vae_config())
            shapes = jax.eval_shape(
                lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3)),
                                   jax.random.PRNGKey(1)),
                jax.random.PRNGKey(0),
            )
            verify_params_match(converted["params"], shapes["params"])
    elif args.kind == "clip":
        from psd_tpu.convert.clip import convert_clip_vision
        from psd_tpu.models.clip import CLIPVisionTower

        n_layers = 1 + max(
            int(k.split(".")[3]) for k in sd if k.startswith("vision_model.encoder.layers.")
        )
        converted = convert_clip_vision(sd, num_layers=n_layers)
        if not args.no_verify:
            tower = CLIPVisionTower()
            shapes = jax.eval_shape(
                lambda k: tower.init(k, jnp.zeros((1, 224, 224, 3))),
                jax.random.PRNGKey(0),
            )
            verify_params_match(converted["params"], shapes["params"])
    elif args.kind.startswith("resnet"):
        from psd_tpu.convert.backbones import convert_resnet

        converted = convert_resnet(sd, keep_fc=False)
    elif args.kind == "vgg16":
        from psd_tpu.convert.backbones import convert_vgg16

        converted = convert_vgg16(sd)
    else:
        from psd_tpu.convert.backbones import convert_inception_v3

        converted = convert_inception_v3(sd)

    save_params_npz(converted, args.out)
    print(f"saved → {args.out}")


if __name__ == "__main__":
    main()
