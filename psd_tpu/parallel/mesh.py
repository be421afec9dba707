"""Device-mesh + sharding utilities.

The reference's only distributed mode is Lightning DDP over NCCL
(training_pipeline_ip.py:111-113). The TPU-native equivalent expresses
data parallelism (and optional FSDP-style parameter sharding) through a
`jax.sharding.Mesh` with XLA inserting all-reduce/all-gather collectives
over ICI — no hand-written communication layer (SURVEY.md §2.2).

Axes:
  dp    — data parallel: batch is split, gradients all-reduced by XLA.
  fsdp  — optional ZeRO-style axis: parameters/optimizer state sharded on
          their largest dim, all-gathered on use.
  tp    — tensor parallel axis reserved for attention-head / channel
          sharding of the UNet at large batch (not required for parity).
"""

from __future__ import annotations

import contextlib
from contextvars import ContextVar
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshConfig:
    dp: int = -1  # -1 → all remaining devices
    fsdp: int = 1
    tp: int = 1

    def resolve(self, n_devices: int) -> "MeshConfig":
        dp = self.dp
        if dp == -1:
            dp = n_devices // (self.fsdp * self.tp)
        need = dp * self.fsdp * self.tp
        assert need <= n_devices, (
            f"mesh {dp}x{self.fsdp}x{self.tp} needs {need} devices, "
            f"have {n_devices}"
        )
        return MeshConfig(dp=dp, fsdp=self.fsdp, tp=self.tp)


def create_mesh(
    cfg: Optional[MeshConfig] = None, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Build the mesh; an explicit smaller-than-world config uses a prefix
    of the device list (useful for smoke runs on a subset)."""
    devices = list(devices if devices is not None else jax.devices())
    cfg = (cfg or MeshConfig()).resolve(len(devices))
    need = cfg.dp * cfg.fsdp * cfg.tp
    arr = np.array(devices[:need]).reshape(cfg.dp, cfg.fsdp, cfg.tp)
    return Mesh(arr, axis_names=("dp", "fsdp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp (and fsdp if >1)."""
    if mesh.shape.get("fsdp", 1) > 1:
        return NamedSharding(mesh, P(("dp", "fsdp")))
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the leading dim split across dp."""
    sharding = batch_sharding(mesh)

    def _put(x):
        spec = P(*([sharding.spec[0]] + [None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, batch)


# ---- batch-sharding constraint scope ------------------------------------
# GSPMD loses the batch sharding through the conditioning path's reshapes
# (ordinal_embedder._project and friends) and falls back to "involuntary
# full rematerialization" — replicate-then-reshard (MULTICHIP_r01 tail).
# Model code calls `constrain_batch(x)` at segment boundaries; it is a no-op
# unless a `batch_sharding_scope(mesh)` is active at TRACE time (set by the
# sharded train step / sampler), so single-chip paths pay nothing.

_BATCH_CTX: ContextVar = ContextVar("psd_tpu_batch_ctx", default=None)


@contextlib.contextmanager
def batch_sharding_scope(mesh: Mesh):
    """Activate leading-dim batch constraints for code traced inside."""
    token = _BATCH_CTX.set((mesh, batch_sharding(mesh).spec[0]))
    try:
        yield
    finally:
        _BATCH_CTX.reset(token)


def mesh_sharding_active() -> bool:
    """True while tracing inside a batch_sharding_scope over a >1-device
    mesh. GSPMD cannot partition a Mosaic custom call (pallas_call), so the
    Pallas kernels shard_map themselves over the batch axes instead
    (kernel_batch_axes below); dispatch sites that still lack a shard_map
    wrapper consult this and take their XLA fallback."""
    ctx = _BATCH_CTX.get()
    if ctx is None:
        return False
    mesh = ctx[0]
    return mesh.devices.size > 1


def kernel_batch_axes():
    """(mesh, batch_axes, n_batch_shards) while a >1-device batch scope is
    active at trace time, else None.

    The Pallas kernels use this to wrap themselves in `shard_map` over the
    batch axes — batch-dim parallelism is embarrassingly parallel for every
    kernel in ops/ (attention, LN projections, resblock fusions), so each
    shard runs the unmodified single-chip Mosaic program on its local batch
    and GSPMD never sees an unpartitionable custom call."""
    ctx = _BATCH_CTX.get()
    if ctx is None:
        return None
    mesh, axes = ctx
    if mesh.devices.size == 1:
        return None
    names = tuple(axes) if isinstance(axes, (tuple, list)) else (axes,)
    n = 1
    for a in names:
        n *= mesh.shape[a]
    return mesh, names, int(n)


def shard_map_batch0(fn, args, extra_specs=None, out_ndim_batch=True):
    """Run `fn(*args)` under shard_map with every array arg split on dim 0
    over the active batch axes (non-arrays / explicitly-spec'd args follow
    `extra_specs`). Returns fn(*args) directly when no scope is active."""
    info = kernel_batch_axes()
    if info is None:
        return fn(*args)
    mesh, axes, _ = info
    from jax import shard_map

    def spec_for(i, a):
        if extra_specs is not None and extra_specs[i] is not None:
            return extra_specs[i]
        if hasattr(a, "ndim") and a.ndim >= 1:
            return P(*([axes] + [None] * (a.ndim - 1)))
        return P()

    in_specs = tuple(spec_for(i, a) for i, a in enumerate(args))
    out_specs = P(axes) if out_ndim_batch else P()
    return shard_map(fn, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)(*args)


def tp_active() -> bool:
    """True while tracing inside a batch_sharding_scope whose mesh has a
    tp axis > 1. Consulted at trace time by the GEGLU feed-forward to pick
    the tp-aware split-projection formulation (see constrain_tp_geglu)."""
    ctx = _BATCH_CTX.get()
    return ctx is not None and ctx[0].shape.get("tp", 1) > 1


def constrain_tp_geglu(w3):
    """Shard a GEGLU net_0_proj kernel VIEW (C, 2, 4C) over tp on its last
    dim. The stored (C, 8C) parameter packs [h|g] halves along columns, so a
    contiguous column shard P(None, tp) would put h and gate on different
    ranks (the round-2 reason net_0_proj stayed replicated). The (C, 2, 4C)
    reshape makes the halves a separate axis — P(None, None, tp) gives every
    rank the SAME column slice of both halves, h·gelu(g) stays rank-local,
    and net_2's row-parallel spec psums the 4C contraction (VERDICT r2 #7).
    No-op outside a tp>1 scope."""
    ctx = _BATCH_CTX.get()
    if ctx is None:
        return w3
    mesh = ctx[0]
    n = mesh.shape.get("tp", 1)
    if n <= 1 or w3.shape[-1] % n:
        return w3
    return jax.lax.with_sharding_constraint(
        w3, NamedSharding(mesh, P(None, None, "tp"))
    )


def constrain_batch(x):
    """Re-assert batch sharding on the leading dim (no-op outside a scope)."""
    ctx = _BATCH_CTX.get()
    if ctx is None or not hasattr(x, "ndim") or x.ndim < 1:
        return x
    mesh, axes = ctx
    spec = P(*([axes] + [None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def fsdp_param_spec(path_leaf_shape, mesh: Mesh) -> P:
    """Shard a parameter's largest divisible dim over fsdp, else replicate."""
    shape = path_leaf_shape
    n = mesh.shape.get("fsdp", 1)
    if n <= 1:
        return P()
    for axis in sorted(range(len(shape)), key=lambda a: -shape[a]):
        if shape[axis] % n == 0 and shape[axis] >= 2 * n:
            spec = [None] * len(shape)
            spec[axis] = "fsdp"
            return P(*spec)
    return P()


def shard_params(params, mesh: Mesh):
    """Apply fsdp_param_spec to every leaf of a parameter pytree."""
    def _put(x):
        return jax.device_put(
            x, NamedSharding(mesh, fsdp_param_spec(x.shape, mesh))
        )

    return jax.tree_util.tree_map(_put, params)


# ---- tensor parallelism (tp axis) ----------------------------------------
# Megatron-style sharding of the UNet transformer sites, expressed purely as
# parameter PartitionSpecs — GSPMD propagates activation shardings and
# inserts the psum at each row-parallel output (no model-code changes):
#
#   to_q/to_k/to_v/to_k_dis/to_v_dis  (C_in, C)  → column-parallel P(_, tp)
#       (heads split across tp: C = H·D reshapes head-major, so contiguous
#        C-shards are whole-head groups and attention stays rank-local)
#   to_out_0                          (C, C)     → row-parallel P(tp, _)
#   ff net_2                          (4C, C)    → row-parallel P(tp, _)
#   ff net_0_proj                     (C, 8C)    → column-parallel at USE
#       time through a (C, 2, 4C) kernel view (constrain_tp_geglu): the
#       stored [h|g]-packed parameter keeps its diffusers-compatible shape
#       (fsdp shards it at rest), while the compute shards both GEGLU
#       halves symmetrically so h·gelu(g) stays rank-local.
#
# The reference has no TP of any kind (SURVEY.md §2.2); this axis exists for
# large-batch multi-chip sampling throughput. NOTE: the custom Pallas
# kernels (spattn/split3/ln_geglu) are single-chip programs — under a tp>1
# mesh the model's XLA fallback paths partition instead; wrapping the
# kernels in shard_map is the planned path to TP+Pallas composition.

_TP_COL = ("to_q", "to_k", "to_v", "to_k_dis", "to_v_dis")
_TP_ROW = ("to_out_0", "net_2")


def tp_param_spec(path: str, shape, mesh: Mesh) -> Optional[P]:
    """Tensor-parallel spec for a UNet param path, or None if not TP-sharded.

    `path` is the '/'-joined module path of the leaf (e.g.
    '.../attn1/to_q/kernel')."""
    n = mesh.shape.get("tp", 1)
    if n <= 1 or not path.endswith("/kernel") or len(shape) != 2:
        return None
    parts = path.split("/")
    if len(parts) < 2:
        return None
    module = parts[-2]
    if module in _TP_COL and shape[1] % n == 0:
        return P(None, "tp")
    if module in _TP_ROW and shape[0] % n == 0:
        return P("tp", None)
    return None


def _path_str(path) -> str:
    import re

    # normalize GetAttrKey/DictKey/SequenceKey reprs to a plain a/b/c path
    return "/".join(
        re.sub(r"[^\w.\-]", "", str(p)).lstrip(".") for p in path
    )


def param_spec(path, shape, mesh: Mesh) -> P:
    """Combined tp-then-fsdp spec for one parameter leaf."""
    tp = tp_param_spec(_path_str(path), shape, mesh)
    if tp is not None:
        return tp
    return fsdp_param_spec(shape, mesh)


def shard_params_tp(params, mesh: Mesh):
    """Place a param tree with TP specs on transformer sites and fsdp
    elsewhere (tp=1 meshes degrade to plain shard_params)."""
    def _put(path, x):
        return jax.device_put(x, NamedSharding(mesh, param_spec(path, x.shape, mesh)))

    return jax.tree_util.tree_map_with_path(_put, params)
