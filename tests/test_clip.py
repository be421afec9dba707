"""CLIP vision tower golden parity vs HF transformers (random weights ported).

This is the SURVEY.md §4b "golden-value parity per module" strategy: build a
small HF CLIPVisionModelWithProjection with random init, port its weights
through psd_tpu.convert.clip, and demand numerical agreement on both output
surfaces the reference consumes (image_embeds and hidden_states[-1],
src/models/image_encoder.py:52-88).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psd_tpu.convert.clip import convert_clip_vision
from psd_tpu.models.clip import CLIPVisionTower, CLIPVisionConfig, tiny_clip_config


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    hf_cfg = HFConfig(
        image_size=56,
        patch_size=14,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        projection_dim=32,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()

    ours_cfg = CLIPVisionConfig(
        image_size=56,
        patch_size=14,
        hidden_size=64,
        num_layers=3,
        num_heads=4,
        mlp_dim=128,
        projection_dim=32,
        dtype=jnp.float32,
    )
    params = convert_clip_vision(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}, num_layers=3
    )
    return hf, ours_cfg, params


def test_image_embeds_parity(hf_pair):
    import torch

    hf, cfg, params = hf_pair
    tower = CLIPVisionTower(cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 56, 56)).astype(np.float32)

    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(x)).image_embeds.numpy()

    ours = np.asarray(
        tower.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    method=tower.image_embeds)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_last_hidden_state_parity(hf_pair):
    import torch

    hf, cfg, params = hf_pair
    tower = CLIPVisionTower(cfg)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, 56, 56)).astype(np.float32)

    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(x), output_hidden_states=True)
        ref = out.hidden_states[-1].numpy()  # pre-post_layernorm, as reference uses

    ours = np.asarray(
        tower.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    method=tower.last_hidden_state)
    )
    assert ours.shape == ref.shape  # (1, 17, 64): 16 patches + CLS
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_vit_l14_param_count():
    tower = CLIPVisionTower()
    pv = jax.eval_shape(
        lambda k: tower.init(k, jnp.zeros((1, 224, 224, 3))), jax.random.PRNGKey(0)
    )
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(pv))
    # HF CLIPVisionModelWithProjection(openai/clip-vit-large-patch14),
    # verified against transformers meta-device instantiation
    assert n == 303_966_208


def test_tiny_tower_shapes():
    cfg = tiny_clip_config()
    tower = CLIPVisionTower(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    params = tower.init(jax.random.PRNGKey(0), x)
    emb = tower.apply(params, x)
    assert emb.shape == (2, 16)
    hs = tower.apply(params, x, method=tower.last_hidden_state)
    assert hs.shape == (2, 17, 32)
