"""UNet structural + numerical tests (SURVEY.md §4b/§4c).

Layer math is cross-checked against independent torch/numpy computations
(no reference code imported), and the full SD v1.4 configuration must match
the published parameter count exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psd_tpu.models.layers import Attention, CrossAttnMode, timestep_embedding
from psd_tpu.models.unet import UNet2DCondition, sd14_unet_config, tiny_unet_config


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def test_sd14_param_count_exact():
    sd = UNet2DCondition(sd14_unet_config())
    pv = jax.eval_shape(
        lambda k: sd.init(
            k, jnp.zeros((1, 32, 32, 4)), jnp.zeros((1,)), jnp.zeros((1, 77, 768))
        ),
        jax.random.PRNGKey(0),
    )
    assert _param_count(pv) == 859_520_964  # SD v1.4 UNet2DConditionModel


@pytest.mark.parametrize("mode", ["plain", "split2", "split3"])
def test_tiny_unet_forward_shapes(mode):
    cfg = tiny_unet_config(attn_mode=mode, num_aoe_tokens=4, num_image_tokens=4,
                           num_delta_tokens=4)
    model = UNet2DCondition(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    t = jnp.array([10, 500])
    n_tok = 12 if mode == "split3" else 8
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, n_tok, 32))
    params = model.init(jax.random.PRNGKey(2), x, t, ctx, 0.0)
    out = model.apply(params, x, t, ctx, jnp.asarray(0.0))
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_split3_delta_scale_is_traced_and_effective():
    cfg = tiny_unet_config(attn_mode="split3", num_aoe_tokens=4, num_image_tokens=4,
                           num_delta_tokens=4)
    model = UNet2DCondition(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    t = jnp.array([100])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 32))
    params = model.init(jax.random.PRNGKey(2), x, t, ctx, 0.0)
    f = jax.jit(lambda d: model.apply(params, x, t, ctx, d))
    out0 = f(jnp.asarray(0.0))
    out1 = f(jnp.asarray(2.0))  # same compiled fn, different traced scalar
    assert not np.allclose(np.asarray(out0), np.asarray(out1))
    # delta tokens all-zero → pathway output invariant in delta content but
    # softmax over zero-K is uniform; changing delta_scale still shifts output
    out0b = f(jnp.asarray(0.0))
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out0b))


def test_split3_attention_matches_manual_math():
    """Single split3 attention site vs hand-rolled numpy triple-pathway."""
    B, S, C, H = 1, 6, 16, 2
    n = 2  # tokens per segment
    mode = CrossAttnMode(kind="split3", num_aoe_tokens=n, num_image_tokens=n,
                         num_delta_tokens=n, anat_gate=0.3, dis_gate=0.7)
    attn = Attention(num_heads=H, mode=mode, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, C))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 3 * n, C))
    params = attn.init(jax.random.PRNGKey(2), x, ctx, 0.0)
    delta = 1.3
    out = np.asarray(attn.apply(params, x, ctx, jnp.asarray(delta)))

    p = jax.tree_util.tree_map(np.asarray, params["params"])
    dh = C // H

    def split_heads(t):  # (B,S,C) -> (B,H,S,dh)
        return t.reshape(B, -1, H, dh).transpose(0, 2, 1, 3)

    def sdpa(q, k, v):
        logits = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        return probs @ v

    xq = np.asarray(x)
    ctxn = np.asarray(ctx)
    q = split_heads(xq @ p["to_q"]["kernel"])
    dis_t, anat_t, delta_t = ctxn[:, :n], ctxn[:, n : 2 * n], ctxn[:, -n:]
    z_anat = sdpa(q, split_heads(anat_t @ p["to_k"]["kernel"]),
                  split_heads(anat_t @ p["to_v"]["kernel"]))
    z_dis = sdpa(q, split_heads(dis_t @ p["to_k_dis"]["kernel"]),
                 split_heads(dis_t @ p["to_v_dis"]["kernel"]))
    z_del = sdpa(q, split_heads(delta_t @ p["to_k_dis"]["kernel"]),
                 split_heads(delta_t @ p["to_v_dis"]["kernel"]))
    z = 0.3 * z_anat + 0.7 * z_dis + delta * z_del
    z = z.transpose(0, 2, 1, 3).reshape(B, S, C)
    expected = z @ p["to_out_0"]["kernel"] + p["to_out_0"]["bias"]
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-5)


def test_self_attention_matches_torch_sdpa():
    import torch

    B, S, C, H = 2, 10, 32, 4
    attn = Attention(num_heads=H, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, C))
    params = attn.init(jax.random.PRNGKey(1), x)
    out = np.asarray(attn.apply(params, x))

    p = jax.tree_util.tree_map(np.asarray, params["params"])
    xt = torch.tensor(np.asarray(x))
    q = (xt @ torch.tensor(p["to_q"]["kernel"])).reshape(B, S, H, C // H).transpose(1, 2)
    k = (xt @ torch.tensor(p["to_k"]["kernel"])).reshape(B, S, H, C // H).transpose(1, 2)
    v = (xt @ torch.tensor(p["to_v"]["kernel"])).reshape(B, S, H, C // H).transpose(1, 2)
    z = torch.nn.functional.scaled_dot_product_attention(q, k, v)
    z = z.transpose(1, 2).reshape(B, S, C)
    expected = (z @ torch.tensor(p["to_out_0"]["kernel"]) +
                torch.tensor(p["to_out_0"]["bias"])).numpy()
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-5)


def test_timestep_embedding_formula():
    t = jnp.array([0.0, 1.0, 999.0])
    dim = 320
    emb = np.asarray(timestep_embedding(t, dim))
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None, :]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    # fp32 sin/cos of args up to ~999 rad: allow fp32-level tolerance
    np.testing.assert_allclose(emb, expected, rtol=1e-3, atol=1e-4)
    assert emb.shape == (3, dim)


def test_block_roles_match_reference_layout():
    """get_block_type semantics for the 4-block SD layout (routing_gates:199-230)."""
    cfg = sd14_unet_config(attn_mode="split3",
                           gate_init_anatomy=(0.1, 0.9), gate_init_disease=(0.9, 0.1))
    assert cfg.block_role("down", 0) == "anatomy"
    assert cfg.block_role("down", 1) == "anatomy"
    assert cfg.block_role("down", 2) == "disease"
    assert cfg.block_role("mid") == "disease"
    assert cfg.block_role("up", 1) == "disease"
    assert cfg.block_role("up", 2) == "anatomy"
    assert cfg.block_role("up", 3) == "anatomy"
    m = cfg.attn_mode_for("down", 0)
    assert (m.anat_gate, m.dis_gate) == (0.1, 0.9)
    m = cfg.attn_mode_for("mid")
    assert (m.anat_gate, m.dis_gate) == (0.9, 0.1)


def test_gelu_is_exact_not_tanh():
    import torch

    from psd_tpu.models.layers import gelu

    x = np.linspace(-3, 3, 101, dtype=np.float32)
    ours = np.asarray(gelu(jnp.asarray(x)))
    ref = torch.nn.functional.gelu(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
