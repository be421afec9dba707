"""MXU-tile-padded FLOP accounting (utils/padded_cost) + generate_cost
composition pins.

The padded numbers are bench.py's BINDING ceiling (VERDICT r4 weak #1);
the composition test pins that XLA cost_analysis counts a lax.scan body
once — the assumption DADD.generate_cost's `full + (steps-1)×eps_step`
composition rests on (ADVICE r4 #2): a JAX/XLA upgrade that changed loop
cost accounting would silently corrupt the bench MFU gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psd_tpu.utils.padded_cost import padded_flops


def test_dot_pads_lane_and_sublane():
    # (8,40)@(40,16): K 40→128, N 16→128, M 8 already sublane-aligned
    got = padded_flops(lambda a, b: a @ b,
                       jnp.zeros((8, 40)), jnp.zeros((40, 16)))
    assert got == 2 * 8 * 128 * 128


def test_dot_batch_dims():
    # batched attention-style contraction: (B,H,M,K)@(B,H,K,N)
    def f(q, k):
        return jnp.einsum("bhmd,bhdn->bhmn", q, k)

    got = padded_flops(f, jnp.zeros((2, 3, 64, 40)), jnp.zeros((2, 3, 40, 64)))
    assert got == 2 * (2 * 3) * 64 * 128 * 128


def test_conv_per_tap_cin_padding():
    # 3×3 conv, Cin=32 (<128 pads per tap), Cout=48
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    got = padded_flops(f, jnp.zeros((2, 8, 8, 32)), jnp.zeros((3, 3, 32, 48)))
    m_pad = ((2 * 8 * 8 + 7) // 8) * 8
    assert got == 2 * m_pad * 9 * 128 * 128


def test_small_cin_conv_uses_im2col():
    # conv_in from 4-channel latents: K = up(9·4, 128), not 9·up(4,128)
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    got = padded_flops(f, jnp.zeros((1, 8, 8, 4)), jnp.zeros((3, 3, 4, 64)))
    assert got == 2 * 64 * 128 * 128  # M=64 aligned, K 36→128, N 64→128


def test_scan_body_counts_once():
    def make(length):
        def f(x):
            def body(c, _):
                return c @ jnp.ones((16, 16)), None
            y, _ = jax.lax.scan(body, x, None, length=length)
            return y
        return f

    x = jnp.zeros((8, 16))
    assert padded_flops(make(5), x) == padded_flops(make(10), x)
    assert padded_flops(make(5), x) == 2 * 8 * 128 * 128


def test_cond_takes_max_branch():
    def f(x, p):
        return jax.lax.cond(
            p, lambda v: v @ jnp.ones((16, 16)),
            lambda v: (v @ jnp.ones((16, 16))) @ jnp.ones((16, 16)), x)

    got = padded_flops(f, jnp.zeros((8, 16)), jnp.asarray(True))
    assert got == 2 * (2 * 8 * 128 * 128)


@pytest.fixture(scope="module")
def tiny_model_params():
    from psd_tpu.testing import tiny_dadd

    model = tiny_dadd()
    params = model.init_core(jax.random.PRNGKey(0), image_size=32)
    vae_params = model.vae.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
        jax.random.PRNGKey(2))
    return model, params, vae_params


@pytest.mark.slow
def test_generate_cost_steps_composition(tiny_model_params):
    """full_program_flops must be steps-independent (scan body counted
    once); the total must grow by exactly eps_step_flops per added step —
    for BOTH the algorithmic and the padded accounting (ADVICE r4 #2)."""
    model, params, vae_params = tiny_model_params
    cond = jax.random.normal(jax.random.PRNGKey(3), (2, 12, 32))
    key = jax.random.PRNGKey(4)

    c2 = model.generate_cost(params, vae_params, cond, key,
                             image_size=32, sampling_steps=2)
    c4 = model.generate_cost(params, vae_params, cond, key,
                             image_size=32, sampling_steps=4)

    assert c2["eps_step_flops"] > 0
    assert c2["padded_eps_step_flops"] > 0
    # scan-body-once invariant: the full program's cost does not scale
    # with trip count (small tolerance: XLA may fold tiny scheduling deltas)
    np.testing.assert_allclose(
        c4["full_program_flops"], c2["full_program_flops"], rtol=1e-3)
    assert c4["padded_full_program_flops"] == c2["padded_full_program_flops"]
    # composed totals differ by exactly 2 × one-eps-step
    np.testing.assert_allclose(
        c4["flops"] - c2["flops"], 2 * c2["eps_step_flops"], rtol=1e-3)
    assert (c4["padded_flops"] - c2["padded_flops"]
            == 2 * c2["padded_eps_step_flops"])
    # padded ≥ algorithmic everywhere (padding only adds flops)
    assert c2["padded_flops"] >= c2["flops"]
    assert c2["padded_eps_step_flops"] >= c2["eps_step_flops"]
