"""Fast GroupNorm parity vs flax nn.GroupNorm."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psd_tpu.ops.norms import GroupNorm, group_norm


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 64), 16),
    ((2, 8, 8, 320), 32),  # SD's awkward 10-channels-per-group case
    ((3, 17, 32), 8),      # sequence layout
])
def test_group_norm_matches_flax(shape, groups):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 3 + 1
    ref_mod = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    p = ref_mod.init(jax.random.PRNGKey(1), x)
    # random affine to exercise the fold-in
    p = {"params": {
        "scale": jax.random.normal(jax.random.PRNGKey(2), p["params"]["scale"].shape) + 1,
        "bias": jax.random.normal(jax.random.PRNGKey(3), p["params"]["bias"].shape),
    }}
    ref = ref_mod.apply(p, x)
    ours = group_norm(x, p["params"]["scale"], p["params"]["bias"], groups, 1e-5)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=3e-5,
                               atol=3e-5)


def test_module_param_names_match_flax():
    x = jnp.zeros((1, 4, 4, 32))
    ours = GroupNorm(num_groups=8).init(jax.random.PRNGKey(0), x)
    theirs = nn.GroupNorm(num_groups=8).init(jax.random.PRNGKey(0), x)
    assert set(ours["params"]) == set(theirs["params"]) == {"scale", "bias"}
