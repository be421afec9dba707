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


def _deep_verify(kind: str, sd, converted) -> None:
    """--verify: the one-command parity gate for REAL checkpoints.

    1. The checkpoint's key+shape surface must match the committed official
       manifest (psd_tpu/convert/manifest.py) exactly.
    2. The converted params must run numerically: load the same weights into
       the torch mirror (tests/torch_ref) — or installed transformers for
       CLIP — and compare fp32 forward outputs on a fixed input.
    """
    import numpy as np
    import torch

    from psd_tpu.convert import manifest as M

    surface = {k: tuple(np.shape(v)) for k, v in sd.items()
               if k.endswith((".weight", ".bias")) or k.endswith("class_embedding")}
    rng = np.random.default_rng(0)

    if kind in ("unet", "unet_split3"):
        M.assert_matches(surface, M.sd_unet_manifest(), "checkpoint (unet)")
        from tests.torch_ref.unet import TorchUNet2DConditionModel
        from psd_tpu.convert.sd import convert_sd_unet
        from psd_tpu.models.unet import UNet2DCondition, sd14_unet_config

        mirror = TorchUNet2DConditionModel()
        mirror.load_state_dict({k: torch.tensor(np.asarray(v)) for k, v in sd.items()})
        mirror.eval()
        x = rng.standard_normal((1, 4, 32, 32), np.float32)
        ctx = rng.standard_normal((1, 48, 768), np.float32)
        t = np.array([500], np.int64)
        with torch.no_grad():
            ref = mirror(torch.tensor(x), torch.tensor(t), torch.tensor(ctx)).numpy()
        model = UNet2DCondition(sd14_unet_config(
            attn_mode="plain", dtype=jnp.float32))
        ours = model.apply(
            convert_sd_unet(sd, warm_start_kv_dis=False),
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
            jnp.asarray(ctx), 0.0)
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-4)
        print("verify: unet fp32 forward parity OK (rtol 1e-3)")
    elif kind == "vae":
        M.assert_matches(surface, M.sd_vae_manifest(), "checkpoint (vae)")
        from tests.torch_ref.vae import TorchAutoencoderKL
        from psd_tpu.models.vae import AutoencoderKL, sd_vae_config

        mirror = TorchAutoencoderKL()
        mirror.load_state_dict({k: torch.tensor(np.asarray(v)) for k, v in sd.items()})
        mirror.eval()
        z = rng.standard_normal((1, 4, 32, 32), np.float32)
        with torch.no_grad():
            ref = mirror.decode(torch.tensor(z)).numpy()
        vae = AutoencoderKL(sd_vae_config(dtype=jnp.float32))
        from psd_tpu.convert.sd import convert_sd_vae

        ours = vae.apply(convert_sd_vae(sd),
                         jnp.asarray(z.transpose(0, 2, 3, 1)),
                         method=vae.decode)
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-4)
        print("verify: vae fp32 decode parity OK (rtol 1e-3)")
    elif kind == "clip":
        M.assert_matches(surface, M.clip_vision_manifest(), "checkpoint (clip)")
        from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection
        from psd_tpu.models.clip import CLIPVisionTower, clip_vit_l14_config

        cfg = CLIPVisionConfig(
            hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
            intermediate_size=4096, patch_size=14, image_size=224,
            projection_dim=768)
        hf = CLIPVisionModelWithProjection(cfg)
        hf.load_state_dict({k: torch.tensor(np.asarray(v)) for k, v in sd.items()})
        hf.eval()
        x = rng.standard_normal((1, 3, 224, 224), np.float32)
        with torch.no_grad():
            ref = hf(torch.tensor(x)).image_embeds.numpy()
        tower = CLIPVisionTower(clip_vit_l14_config(dtype=jnp.float32))
        ours = tower.apply(converted, jnp.asarray(x.transpose(0, 2, 3, 1)),
                           method=tower.image_embeds)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)
        print("verify: clip fp32 image_embeds parity OK (rtol 1e-3)")
    else:
        print(f"--verify: no manifest/parity gate for kind={kind} "
              "(shape verification only)")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True,
                   choices=["unet", "unet_split3", "vae", "clip", "resnet18",
                            "resnet34", "resnet50", "resnet101", "vgg16",
                            "inception"])
    p.add_argument("--src", required=True, help="torch checkpoint file")
    p.add_argument("--out", default=None, help="output .npz")
    p.add_argument("--no-verify", action="store_true")
    p.add_argument("--verify", action="store_true",
                   help="deep gate: official key+shape manifest check plus "
                        "fp32 forward parity against the torch mirror "
                        "(tests/torch_ref) / installed transformers; "
                        "run this the day real checkpoints are available")
    args = p.parse_args(argv)
    if not args.out and not args.verify:
        p.error("--out is required unless --verify")
    if args.verify:
        # parity math needs true fp32 matmuls: the TPU backend (and the axon
        # sitecustomize, which force-sets jax_platforms at interpreter start)
        # lowers fp32 dots to bf16 passes — run the gate on CPU.
        jax.config.update("jax_platforms", "cpu")

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

    if args.verify:
        _deep_verify(args.kind, sd, converted)
    if args.out:
        save_params_npz(converted, args.out)
        print(f"saved → {args.out}")


if __name__ == "__main__":
    main()
