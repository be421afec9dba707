"""Schedule math golden tests vs closed-form numpy (SURVEY.md §4a)."""

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.diffusion.schedule import NoiseSchedule, ddim_timesteps


def _np_schedule(T=1000, b0=0.00085, b1=0.012):
    betas = np.linspace(b0, b1, T, dtype=np.float32)
    acp = np.cumprod(1.0 - betas.astype(np.float64)).astype(np.float32)
    return betas, acp


def test_linear_schedule_values():
    sched = NoiseSchedule()
    betas, acp = _np_schedule()
    np.testing.assert_allclose(sched.betas, betas, rtol=0, atol=0)
    np.testing.assert_allclose(sched.alphas_cumprod, acp, rtol=1e-6)
    assert sched.alphas_cumprod_prev[0] == 1.0
    np.testing.assert_allclose(sched.alphas_cumprod_prev[1:], acp[:-1], rtol=1e-6)
    # endpoints of the SD schedule
    assert abs(sched.betas[0] - 0.00085) < 1e-9
    assert abs(sched.betas[-1] - 0.012) < 1e-9


def test_q_sample_closed_form():
    sched = NoiseSchedule(num_train_timesteps=100)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (3, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 8, 4))
    t = jnp.array([0, 50, 99])
    xt = sched.q_sample(x0, t, noise)
    acp = sched.alphas_cumprod
    for b, ti in enumerate([0, 50, 99]):
        expected = np.sqrt(acp[ti]) * np.asarray(x0[b]) + np.sqrt(1 - acp[ti]) * np.asarray(
            noise[b]
        )
        np.testing.assert_allclose(np.asarray(xt[b]), expected, rtol=1e-5, atol=1e-6)


def test_min_snr_weight():
    sched = NoiseSchedule()
    t = jnp.array([0, 10, 500, 999])
    w = np.asarray(sched.min_snr_weight(t, gamma=1.0))
    snr = sched.snr[np.array([0, 10, 500, 999])]
    expected = np.minimum(snr, 1.0) / (snr + 1e-8)
    np.testing.assert_allclose(w, expected, rtol=1e-5)
    # early timesteps: SNR >> 1 → weight ≈ 1/SNR (tiny); late: weight ≈ 1
    assert w[0] < 1e-2 and w[-1] > 0.99


def test_ddim_timesteps_match_torch_linspace_semantics():
    # torch.linspace(999, 0, 50, dtype=long) truncates toward zero
    import torch

    ours = ddim_timesteps(1000, 50)
    ref = torch.linspace(999, 0, steps=50, dtype=torch.long).numpy()
    np.testing.assert_array_equal(ours, ref)
    ours10 = ddim_timesteps(1000, 10)
    ref10 = torch.linspace(999, 0, steps=10, dtype=torch.long).numpy()
    np.testing.assert_array_equal(ours10, ref10)
    assert ours[0] == 999 and ours[-1] == 0
