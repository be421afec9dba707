"""Trace-time training/inference mode switch for kernel selection.

Several Pallas kernels here are inference-optimized: their custom VJPs
recompute the forward (spattn re-runs a full attention forward inside its
backward; the fused LN→proj kernels back-prop through XLA reference math).
Under gradient rematerialization that triples the forward work — measured
52.4 → 43.2 img/s on the SD-scale train step when the inference kernels
leaked into training.

`training_mode()` is entered by the train step around loss tracing; kernel
dispatch sites consult `is_training()` AT TRACE TIME and pick the
fused-backward implementations (stock flash attention, plain XLA LN) for
training while inference keeps the faster single-pass forward kernels.
"""

from __future__ import annotations

import contextlib
from contextvars import ContextVar

_TRAINING: ContextVar[bool] = ContextVar("psd_tpu_training_mode", default=False)


@contextlib.contextmanager
def training_mode():
    token = _TRAINING.set(True)
    try:
        yield
    finally:
        _TRAINING.reset(token)


def is_training() -> bool:
    return _TRAINING.get()


_DISABLED: ContextVar[frozenset] = ContextVar(
    "psd_tpu_disabled_kernels", default=frozenset()
)


@contextlib.contextmanager
def disable_kernels(*names: str):
    """Trace-time kernel kill-switch for interleaved A/B measurement.

    Dispatch gates consult `kernel_disabled(name)`; tracing a program inside
    this scope routes the named kernels to their XLA fallbacks. Purely a
    measurement tool (scripts/bench_*): both variants build in ONE process
    so the shared-chip contention discipline (interleaved round-robin,
    per-variant minimum — docs/perf_notes.md) applies."""
    token = _DISABLED.set(_DISABLED.get() | frozenset(names))
    try:
        yield
    finally:
        _DISABLED.reset(token)


def kernel_disabled(name: str) -> bool:
    return name in _DISABLED.get()


def kernels_forced() -> bool:
    """True when PSD_TPU_FORCE_KERNELS=interpret: kernel dispatch gates
    treat the backend as TPU-capable and the Pallas kernels run in
    interpreter mode. Lets CPU tests (and the virtual-mesh dryrun) exercise
    the REAL kernel dispatch paths — including their shard_map mesh
    composition — without TPU hardware."""
    import os

    return os.environ.get("PSD_TPU_FORCE_KERNELS") == "interpret"


def kernel_backend_ok() -> bool:
    """TPU backend, or forced-interpret mode (kernels_forced)."""
    if kernels_forced():
        return True
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False
