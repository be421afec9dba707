"""Conditioning stack tests: AOE/BOE semantics, purifier & projection parity
vs torch-built equivalents (weights ported, SURVEY.md §4b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psd_tpu.conditioning import (
    AdditiveOrdinalEmbedder,
    BasicOrdinalEmbedder,
    FeaturePurifier,
    ImageProjection,
    ImageProjectionPlus,
)


class TestAOE:
    @pytest.fixture(scope="class")
    def aoe(self):
        m = AdditiveOrdinalEmbedder(num_classes=4, embedding_dim=32, num_tokens=4)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((2,)))
        return m, params

    def test_table_is_cumulative_and_monotonic_init(self, aoe):
        m, params = aoe
        table = np.asarray(m.apply(params, method=m.class_table))
        assert table.shape == (4, 32)
        deltas = np.asarray(params["params"]["deltas"])
        # E[k] − E[k−1] == deltas[k−1]
        np.testing.assert_allclose(np.diff(table, axis=0), deltas, rtol=1e-5)
        # monotonic init: positive mean, increasing per-row scale
        row_means = deltas.mean(axis=1)
        assert (row_means > 0).all()
        assert row_means[2] > row_means[0]

    def test_interpolation_midpoint(self, aoe):
        m, params = aoe
        table = np.asarray(m.apply(params, method=m.class_table))

        # project table rows through the same MLP by evaluating integer labels
        e1 = np.asarray(m.apply(params, jnp.array([1.0])))
        e2 = np.asarray(m.apply(params, jnp.array([2.0])))
        # pre-projection interp is linear, but projection is nonlinear (GELU),
        # so check the PRE-projection interp via the table directly
        y = 1.5
        lo, hi = table[1], table[2]
        interp = 0.5 * lo + 0.5 * hi
        # midpoint of clamped labels out of range: label 5 → E[3]
        e5 = np.asarray(m.apply(params, jnp.array([5.0])))
        e3 = np.asarray(m.apply(params, jnp.array([3.0])))
        np.testing.assert_allclose(e5, e3, rtol=1e-5)
        assert e1.shape == (1, 4, 32)
        assert not np.allclose(e1, e2)
        assert np.isfinite(interp).all()

    def test_delta_zero_when_equal_and_antisymmetric(self, aoe):
        m, params = aoe
        s = jnp.array([2.0, 0.0])
        t = jnp.array([2.0, 0.0])
        d = np.asarray(m.apply(params, s, t, method=m.ordinal_delta))
        np.testing.assert_allclose(d, 0.0, atol=1e-6)  # biases cancel post-proj
        d_up = np.asarray(
            m.apply(params, jnp.array([0.0]), jnp.array([3.0]), method=m.ordinal_delta)
        )
        d_dn = np.asarray(
            m.apply(params, jnp.array([3.0]), jnp.array([0.0]), method=m.ordinal_delta)
        )
        np.testing.assert_allclose(d_up, -d_dn, rtol=1e-4, atol=1e-6)

    def test_negative_embedding_smooth_map(self, aoe):
        m, params = aoe
        # at label 0 → negative uses label 1; at label>=1 → label 0
        n0 = np.asarray(m.apply(params, jnp.array([0.0]), method=m.negative))
        e1 = np.asarray(m.apply(params, jnp.array([1.0])))
        np.testing.assert_allclose(n0, e1, rtol=1e-5)
        n2 = np.asarray(m.apply(params, jnp.array([2.0]), method=m.negative))
        e0 = np.asarray(m.apply(params, jnp.array([0.0])))
        np.testing.assert_allclose(n2, e0, rtol=1e-5)

    def test_unconditional_null(self, aoe):
        m, params = aoe
        out = m.apply(params, jnp.zeros((3,)), False, True)
        assert out.shape == (3, 32)
        np.testing.assert_allclose(np.asarray(out), 0.0)  # zero-init null

    def test_training_noise_applied_only_in_training(self, aoe):
        m, params = aoe
        lbl = jnp.array([1.0])
        a = m.apply(params, lbl, False)
        b = m.apply(params, lbl, False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = m.apply(params, lbl, True, rngs={"noise": jax.random.PRNGKey(1)})
        d = m.apply(params, lbl, True, rngs={"noise": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(c), np.asarray(d))


def test_boe_interpolation_and_shape():
    m = BasicOrdinalEmbedder(num_classes=4, embedding_dim=16)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((2,)))
    table = np.asarray(params["params"]["table"])
    out = np.asarray(m.apply(params, jnp.array([0.5])))
    np.testing.assert_allclose(out[0], 0.5 * table[0] + 0.5 * table[1], rtol=1e-5)
    assert m.apply(params, jnp.zeros((3,)), False, True).shape == (3, 16)


def _port_torch_mha(mha, D):
    """torch nn.MultiheadAttention → our q/k/v/out param dict."""
    w = mha.in_proj_weight.detach().numpy()
    b = mha.in_proj_bias.detach().numpy()
    qw, kw_, vw = np.split(w, 3, axis=0)
    qb, kb, vb = np.split(b, 3, axis=0)
    return {
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw_.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": {
            "kernel": mha.out_proj.weight.detach().numpy().T,
            "bias": mha.out_proj.bias.detach().numpy(),
        },
    }


def _ln_params(ln):
    return {"scale": ln.weight.detach().numpy(), "bias": ln.bias.detach().numpy()}


def _dense_params(lin):
    return {"kernel": lin.weight.detach().numpy().T,
            "bias": lin.bias.detach().numpy()}


def test_purifier_parity_with_torch():
    import torch
    import torch.nn as tnn

    D, H, FF = 32, 4, 2
    torch.manual_seed(0)

    norm_img, norm_aoe, norm_out = tnn.LayerNorm(D), tnn.LayerNorm(D), tnn.LayerNorm(D)
    mha = tnn.MultiheadAttention(D, H, batch_first=True)
    g1, g2 = tnn.Linear(2 * D, D * FF), tnn.Linear(D * FF, D)
    for mod in (norm_img, norm_aoe, norm_out, g1, g2):
        for p in mod.parameters():
            tnn.init.normal_(p, std=0.2)

    def torch_purify(img, aoe):
        with torch.no_grad():
            i_n, a_n = norm_img(img), norm_aoe(aoe)
            dis, _ = mha(i_n, a_n, a_n)
            gate = torch.sigmoid(g2(torch.nn.functional.gelu(g1(
                torch.cat([dis, i_n], dim=-1)))))
            return norm_out(img - gate * dis).numpy()

    params = {
        "params": {
            "norm_img": _ln_params(norm_img),
            "norm_aoe": _ln_params(norm_aoe),
            "norm_out": _ln_params(norm_out),
            "cross_attn": _port_torch_mha(mha, D),
            "gate_0": _dense_params(g1),
            "gate_2": _dense_params(g2),
        }
    }
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 6, D)).astype(np.float32)
    aoe = rng.normal(size=(2, 4, D)).astype(np.float32)

    import torch as _t

    ref = torch_purify(_t.tensor(img), _t.tensor(aoe))
    ours = np.asarray(
        FeaturePurifier(dim=D, num_heads=H, ff_mult=FF).apply(
            params, jnp.asarray(img), jnp.asarray(aoe)
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_image_projection_shapes_and_norm():
    m = ImageProjection(cross_attention_dim=24, num_tokens=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 10))
    params = m.init(jax.random.PRNGKey(1), x)
    out = np.asarray(m.apply(params, x))
    assert out.shape == (3, 4, 24)
    # LayerNorm: per-token mean≈0, std≈1 (no affine drift at init std=1? affine
    # is init scale=1 bias=0 → exact normalization)
    np.testing.assert_allclose(out.mean(-1), 0.0, atol=1e-5)


def test_image_projection_plus_parity_with_torch():
    import torch
    import torch.nn as tnn

    Dc, D, N, H, depth = 20, 16, 3, 2, 2
    torch.manual_seed(1)
    proj_in = tnn.Linear(Dc, D)
    latents = torch.randn(1, N, D) * 0.02
    layers = []
    for _ in range(depth):
        layers.append(
            dict(
                attn=tnn.MultiheadAttention(D, H, batch_first=True),
                n1=tnn.LayerNorm(D),
                n2=tnn.LayerNorm(D),
                f1=tnn.Linear(D, 4 * D),
                f2=tnn.Linear(4 * D, D),
            )
        )
    norm_out = tnn.LayerNorm(D)

    def torch_forward(x):
        with torch.no_grad():
            h = proj_in(x)
            lat = latents.expand(x.shape[0], -1, -1)
            for L in layers:
                r = lat
                q = L["n1"](lat)
                a, _ = L["attn"](q, h, h)
                lat = r + a
                r = lat
                lat = r + L["f2"](torch.nn.functional.gelu(L["f1"](L["n2"](lat))))
            return norm_out(lat).numpy()

    p = {
        "latents": latents.numpy(),
        "proj_in": _dense_params(proj_in),
        "norm_out": _ln_params(norm_out),
    }
    for d, L in enumerate(layers):
        p[f"layers_{d}_norm1"] = _ln_params(L["n1"])
        p[f"layers_{d}_norm2"] = _ln_params(L["n2"])
        p[f"layers_{d}_cross_attn"] = _port_torch_mha(L["attn"], D)
        p[f"layers_{d}_ff_0"] = _dense_params(L["f1"])
        p[f"layers_{d}_ff_2"] = _dense_params(L["f2"])

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 7, Dc)).astype(np.float32)
    import torch as _t

    ref = torch_forward(_t.tensor(x))
    ours = np.asarray(
        ImageProjectionPlus(
            clip_hidden_dim=Dc, cross_attention_dim=D, num_tokens=N,
            num_heads=H, depth=depth,
        ).apply({"params": p}, jnp.asarray(x))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
