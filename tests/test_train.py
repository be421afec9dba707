"""Training infrastructure tests: optimizer groups, LR schedule, EMA,
multi-device DP train step on the virtual CPU mesh (SURVEY.md §4d)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from psd_tpu.core.config import Config
from psd_tpu.parallel.mesh import MeshConfig, create_mesh, shard_batch
from psd_tpu.train import (
    build_optimizer,
    compile_train_step,
    create_train_state,
    ema_init,
    ema_update,
    shard_train_state,
    warmup_cosine_epochwise,
)

from psd_tpu.testing import tiny_dadd


def test_warmup_cosine_epochwise():
    sch = warmup_cosine_epochwise(
        base_lr=1e-4, warmup_epochs=2, max_epochs=10, steps_per_epoch=100,
        min_lr=1e-6,
    )
    # epoch 0 → warmup start lr*0.01
    np.testing.assert_allclose(float(sch(0)), 1e-6, rtol=1e-5)
    # epoch 2 → base lr
    np.testing.assert_allclose(float(sch(200)), 1e-4, rtol=1e-5)
    # epoch 10+ → min_lr
    np.testing.assert_allclose(float(sch(1000)), 1e-6, rtol=1e-4)
    # monotone decrease after warmup
    lrs = [float(sch(s)) for s in range(200, 1001, 100)]
    assert all(a >= b for a, b in zip(lrs, lrs[1:]))


def test_optimizer_group_labels_double_lr():
    """projection/purifier must be in the 2x LR group."""
    from psd_tpu.train.optim import _group_label

    class K:  # emulate jax DictKey
        def __init__(self, key):
            self.key = key

    assert _group_label((K("params"), K("image_projection"), K("kernel"))) == "x2"
    assert _group_label((K("params"), K("feature_purifier"), K("b"))) == "x2"
    assert _group_label((K("params"), K("unet"), K("conv_in"))) == "x1"
    assert _group_label((K("params"), K("ordinal_embedder"), K("deltas"))) == "x1"


def test_ema_semantics():
    p0 = {"w": jnp.ones((4,))}
    ema = ema_init(p0)
    # before start step: no update
    ema = ema_update(ema, {"w": jnp.full((4,), 5.0)}, jnp.asarray(10),
                     start_step=100, every=4)
    assert int(ema.count) == 0
    np.testing.assert_allclose(np.asarray(ema.params["w"]), 1.0)
    # first update at step>=100 → straight copy
    ema = ema_update(ema, {"w": jnp.full((4,), 5.0)}, jnp.asarray(100),
                     start_step=100, every=4)
    assert int(ema.count) == 1
    np.testing.assert_allclose(np.asarray(ema.params["w"]), 5.0)
    # off-cycle step: no update
    ema = ema_update(ema, {"w": jnp.full((4,), 9.0)}, jnp.asarray(101),
                     start_step=100, every=4)
    np.testing.assert_allclose(np.asarray(ema.params["w"]), 5.0)
    # next cycle: decay blend
    ema = ema_update(ema, {"w": jnp.full((4,), 9.0)}, jnp.asarray(104),
                     decay=0.9, start_step=100, every=4)
    np.testing.assert_allclose(np.asarray(ema.params["w"]), 0.9 * 5 + 0.1 * 9,
                               rtol=1e-6)


def test_dp_train_step_on_8_device_mesh():
    """Full train step over dp=8: loss finite, params update, EMA tracks."""
    model = tiny_dadd()
    mesh = create_mesh(MeshConfig(dp=8))
    tx = build_optimizer(model.cfg, steps_per_epoch=10)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), tx=tx,
                                   image_size=32)
    state = shard_train_state(state, mesh)
    step_fn = compile_train_step(model, tx, mesh)

    B = 16
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (B, 4, 4, 4)),
        "labels": jnp.tile(jnp.arange(4.0), 4),
        "clip_feats": jax.random.normal(jax.random.PRNGKey(2), (B, 17, 32)),
    }
    batch = shard_batch(mesh, batch)

    w_before = np.asarray(
        jax.device_get(state.params["params"]["unet"]["conv_in"]["kernel"])
    )
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    w_after = np.asarray(
        jax.device_get(state.params["params"]["unet"]["conv_in"]["kernel"])
    )
    assert not np.allclose(w_before, w_after)
    assert int(state.step) == 2


@pytest.mark.slow
def test_fsdp_mesh_train_step():
    """dp=2 × fsdp=4: params sharded over fsdp, step still runs."""
    model = tiny_dadd()
    mesh = create_mesh(MeshConfig(dp=2, fsdp=4))
    tx = build_optimizer(model.cfg, steps_per_epoch=10)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), tx=tx,
                                   image_size=32)
    state = shard_train_state(state, mesh)
    step_fn = compile_train_step(model, tx, mesh)
    B = 8
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (B, 4, 4, 4)),
        "labels": jnp.tile(jnp.arange(4.0), 2),
        "clip_feats": jax.random.normal(jax.random.PRNGKey(2), (B, 17, 32)),
    }
    batch = shard_batch(mesh, batch)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_tp_mesh_train_step():
    """dp=2 × tp=2 (Megatron-style head/row sharding of the transformer
    kernels via tp_param_spec): kernels actually sharded over tp, loss
    matches the dp-only run (TP is a pure re-layout of the same math)."""
    from jax.sharding import PartitionSpec as P

    from psd_tpu.parallel.mesh import tp_param_spec

    model = tiny_dadd()
    mesh = create_mesh(MeshConfig(dp=4, tp=2))
    tx = build_optimizer(model.cfg, steps_per_epoch=10)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), tx=tx,
                                   image_size=32)
    state = shard_train_state(state, mesh)

    # spec sanity on real paths
    spec = tp_param_spec("a/attn1/to_q/kernel", (32, 32), mesh)
    assert spec == P(None, "tp")
    assert tp_param_spec("a/ff/net_2/kernel", (64, 16), mesh) == P("tp", None)
    assert tp_param_spec("a/conv1/kernel", (3, 3, 8, 8), mesh) is None

    # at least one attention kernel must be tp-sharded on device
    unet = state.params["params"]["unet"]
    leaf = None
    for path, x in jax.tree_util.tree_leaves_with_path(unet):
        pstr = "/".join(str(p) for p in path)
        if "to_q" in pstr and "kernel" in pstr:
            leaf = x
            break
    assert leaf is not None
    assert "tp" in str(leaf.sharding.spec)

    step_fn = compile_train_step(model, tx, mesh)
    B = 8
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (B, 4, 4, 4)),
        "labels": jnp.tile(jnp.arange(4.0), 2),
        "clip_feats": jax.random.normal(jax.random.PRNGKey(2), (B, 17, 32)),
    }
    batch = shard_batch(mesh, batch)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    loss_tp = float(metrics["loss"])
    assert np.isfinite(loss_tp)

    # same step on a dp-only mesh must give the same loss (same math)
    mesh2 = create_mesh(MeshConfig(dp=8))
    state2, tx2 = create_train_state(model, jax.random.PRNGKey(0), tx=tx,
                                     image_size=32)
    state2 = shard_train_state(state2, mesh2)
    step2 = compile_train_step(model, tx2, mesh2)
    batch2 = shard_batch(mesh2, {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (B, 4, 4, 4)),
        "labels": jnp.tile(jnp.arange(4.0), 2),
        "clip_feats": jax.random.normal(jax.random.PRNGKey(2), (B, 17, 32)),
    })
    _, metrics2 = step2(state2, batch2, jax.random.PRNGKey(3))
    np.testing.assert_allclose(loss_tp, float(metrics2["loss"]),
                               rtol=2e-4, atol=2e-5)


def test_train_step_bf16_compute():
    """Regression: the bf16 train graph must differentiate end-to-end.

    jax 0.9's conv transpose rejects mixed-dtype operands, so a
    `preferred_element_type=fp32` conv with bf16 inputs traces forward but
    explodes under value_and_grad — exactly the bench_train (chip, bf16)
    configuration, which the fp32 CPU tests never exercised."""
    model = tiny_dadd(dtype=jnp.bfloat16)
    tx = build_optimizer(model.cfg, steps_per_epoch=10)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), tx=tx,
                                   image_size=32)
    from psd_tpu.train import make_train_step

    step_fn = jax.jit(make_train_step(model, tx))
    B = 4
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (B, 4, 4, 4)),
        "labels": jnp.arange(4.0),
        "clip_feats": jax.random.normal(jax.random.PRNGKey(2), (B, 17, 32)),
    }
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_checkpoint_roundtrip(tmp_path):
    import dataclasses

    from psd_tpu.train import CheckpointManager

    model = tiny_dadd()
    tx = build_optimizer(model.cfg, steps_per_epoch=10)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), tx=tx,
                                   image_size=32)
    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(0, state, force=True)
    mgr.wait()
    restored = mgr.restore(jax.tree_util.tree_map(np.asarray, state))
    np.testing.assert_allclose(
        np.asarray(state.params["params"]["unet"]["conv_in"]["kernel"]),
        restored.params["params"]["unet"]["conv_in"]["kernel"],
    )
    assert mgr.latest_step() == 0
    mgr.close()


# ---- gradient accumulation (reference: Trainer(accumulate_grad_batches=k),
# training_pipeline_ip.py:117; VERDICT r3 item 3) --------------------------


class _DetLossModel:
    """tiny_dadd with an rng-FREE train loss.

    accum=2 at B/2 can only match accum=1 at B exactly if both see the same
    per-sample (noise, t) draws; the real loss folds rng per micro-step. A
    deterministic surrogate (t and pseudo-noise derived from the batch
    itself, real UNet + conditioning underneath) isolates the accumulation
    machinery, which is what this test pins.
    """

    def __init__(self, dadd):
        self._dadd = dadd
        self.cfg = dadd.cfg

    def train_loss(self, p, batch, rng):
        d = self._dadd
        lat = batch["latents"]
        t = (batch["labels"] * 100).astype(jnp.int32) + 100
        noise = jnp.roll(lat, 1, axis=-1)
        noisy = d.schedule.q_sample(lat, t, noise)
        cond = d.core.apply(
            p, batch["labels"], batch["clip_feats"], None, False, False,
            1.0, None, method=d.core.prepare_conditioning,
        )
        eps = d.core.apply(p, noisy, t, cond, 0.0, method=d.core.eps)
        per = jnp.mean((eps.astype(jnp.float32) - noise) ** 2, axis=(1, 2, 3))
        loss = jnp.mean(per)
        return loss, {"loss": loss}


def _accum_batch(B):
    return {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (B, 4, 4, 4)),
        "labels": jnp.tile(jnp.arange(4.0), B // 4),
        "clip_feats": jax.random.normal(jax.random.PRNGKey(2), (B, 17, 32)),
    }


def test_grad_accumulation_matches_full_batch():
    """accum=2 at B/2 follows the same update trajectory as accum=1 at B."""
    from psd_tpu.train import make_train_step

    B, n_opt_steps = 8, 3
    batch = _accum_batch(B)
    finals = {}
    for accum in (1, 2):
        real = tiny_dadd()
        real.cfg.training.accumulate_grad_batches = accum
        real.cfg.training.update_starting_at_step = 0
        real.cfg.training.update_every_n_steps = 1
        model = _DetLossModel(real)
        tx = build_optimizer(real.cfg, steps_per_epoch=10)
        state, tx = create_train_state(real, jax.random.PRNGKey(0), tx=tx,
                                       image_size=32)
        step_fn = jax.jit(make_train_step(model, tx))
        rng = jax.random.PRNGKey(3)
        for _ in range(n_opt_steps):
            if accum == 1:
                state, _ = step_fn(state, batch, rng)
            else:
                for half in (jax.tree_util.tree_map(lambda x: x[: B // 2], batch),
                             jax.tree_util.tree_map(lambda x: x[B // 2:], batch)):
                    state, _ = step_fn(state, half, rng)
        finals[accum] = jax.device_get(state)

    # per-sample-mean loss ⇒ mean of half-batch grads == full-batch grad,
    # so AdamW + schedule + EMA must land on identical weights
    leaves1 = jax.tree_util.tree_leaves(finals[1].params)
    leaves2 = jax.tree_util.tree_leaves(finals[2].params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)
    assert int(finals[1].ema.count) == int(finals[2].ema.count) == n_opt_steps
    for a, b in zip(jax.tree_util.tree_leaves(finals[1].ema.params),
                    jax.tree_util.tree_leaves(finals[2].ema.params)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_grad_accumulation_micro_step_is_a_noop():
    """Between optimizer steps: params frozen, EMA not advanced; the k-th
    micro-step applies the update (real stochastic loss path)."""
    from psd_tpu.train import make_train_step

    model = tiny_dadd()
    model.cfg.training.accumulate_grad_batches = 2
    model.cfg.training.update_starting_at_step = 0
    model.cfg.training.update_every_n_steps = 1
    tx = build_optimizer(model.cfg, steps_per_epoch=10)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), tx=tx,
                                   image_size=32)
    p0 = jax.device_get(state.params)
    step_fn = jax.jit(make_train_step(model, tx))
    batch = _accum_batch(4)

    state, _ = step_fn(state, batch, jax.random.PRNGKey(3))
    p1 = jax.device_get(state.params)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(a, b)
    assert int(state.ema.count) == 0

    state, _ = step_fn(state, batch, jax.random.PRNGKey(3))
    p2 = state.params
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(jax.device_get(p2)))
    )
    assert changed, "second micro-step must apply the optimizer update"
    assert int(state.ema.count) == 1


def test_grad_accumulation_on_dp_mesh():
    """MultiSteps state shards/donates cleanly through the mesh train step."""
    mesh = create_mesh(MeshConfig(dp=8))
    model = tiny_dadd()
    model.cfg.training.accumulate_grad_batches = 2
    tx = build_optimizer(model.cfg, steps_per_epoch=10)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), tx=tx,
                                   image_size=32)
    state = shard_train_state(state, mesh)
    step_fn = compile_train_step(model, tx, mesh)
    batch = shard_batch(mesh, _accum_batch(8))
    for _ in range(2):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(jax.device_get(state.opt_state.gradient_step)) == 1
