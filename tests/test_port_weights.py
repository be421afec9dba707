"""End-to-end exercise of scripts/port_weights.py --verify (VERDICT r3 weak #3).

The manifest functions the script shares with tests/test_manifest.py are
covered there; THESE tests run the script itself — state-dict file on disk
→ load → convert → manifest gate → fp32 forward parity → .npz save — so
the one-command gate for real checkpoints (SURVEY.md §2.3) is known-good
before the day CompVis/OpenAI weights arrive. The state dicts are the
torch mirrors' (random but REAL torch init), serialized exactly like a
downloaded torch .bin checkpoint.
"""

import importlib.util
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _port_weights_main():
    spec = importlib.util.spec_from_file_location(
        "port_weights", REPO / "scripts" / "port_weights.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main


@pytest.mark.slow
def test_port_weights_verify_vae(tmp_path, capsys):
    import torch

    from tests.torch_ref.vae import TorchAutoencoderKL

    torch.manual_seed(0)
    src = tmp_path / "vae.bin"
    torch.save(TorchAutoencoderKL().state_dict(), src)
    out_npz = tmp_path / "vae.npz"
    _port_weights_main()(
        ["--kind", "vae", "--src", str(src), "--verify", "--out", str(out_npz)])
    out = capsys.readouterr().out
    assert "verify: vae fp32 decode parity OK" in out
    assert out_npz.exists()


@pytest.mark.slow
def test_port_weights_verify_clip(tmp_path, capsys):
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    torch.manual_seed(0)
    cfg = CLIPVisionConfig(
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, patch_size=14, image_size=224,
        projection_dim=768)
    src = tmp_path / "clip.bin"
    torch.save(CLIPVisionModelWithProjection(cfg).state_dict(), src)
    out_npz = tmp_path / "clip.npz"
    _port_weights_main()(
        ["--kind", "clip", "--src", str(src), "--verify", "--out", str(out_npz)])
    out = capsys.readouterr().out
    assert "verify: clip fp32 image_embeds parity OK" in out
    assert out_npz.exists()


@pytest.mark.slow
def test_port_weights_verify_unet(tmp_path, capsys):
    """SD-scale (859M param) round trip through the script's verify path."""
    import torch

    from tests.torch_ref.unet import TorchUNet2DConditionModel

    torch.manual_seed(0)
    src = tmp_path / "unet.bin"
    torch.save(TorchUNet2DConditionModel().state_dict(), src)
    out_npz = tmp_path / "unet.npz"
    _port_weights_main()(
        ["--kind", "unet", "--src", str(src), "--verify", "--out", str(out_npz)])
    out = capsys.readouterr().out
    assert "verify: unet fp32 forward parity OK" in out
    assert out_npz.exists()


def test_port_weights_verify_catches_wrong_surface(tmp_path):
    """A checkpoint whose surface deviates from the official manifest must
    FAIL the gate, not silently convert."""
    import numpy as np
    import torch

    from tests.torch_ref.vae import TorchAutoencoderKL

    torch.manual_seed(0)
    sd = TorchAutoencoderKL().state_dict()
    # corrupt the surface: drop one tensor and mis-shape another
    sd.pop("decoder.conv_out.bias")
    sd["encoder.conv_in.weight"] = torch.zeros(16, 3, 3, 3)
    src = tmp_path / "vae_bad.bin"
    torch.save(sd, src)
    with pytest.raises((AssertionError, ValueError, KeyError, RuntimeError)):
        _port_weights_main()(
            ["--kind", "vae", "--src", str(src), "--verify"])
    assert not (tmp_path / "vae_bad.npz").exists()
    del np
