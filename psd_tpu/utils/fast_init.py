"""Fast host-side parameter initialization + persistent compile cache.

`flax.Module.init` of the 859M-param UNet jit-compiles the whole forward on
the accelerator just to produce initial weights — through the remote-compile
tunnel that costs minutes. For benchmarking/smoke paths we instead
eval_shape the init (no compilation, no device work) and fill the leaves
host-side with numpy normals.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def enable_compile_cache(path: str | Path = None) -> None:
    """Persistent compilation cache: second runs of bench/entry skip XLA."""
    path = Path(path or os.environ.get(
        "PSD_TPU_CACHE", Path(__file__).resolve().parent.parent.parent / ".jax_cache"
    ))
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax — cache simply not enabled


def fast_init(module, rngs, *args, scale: float = 0.02, seed: int = 0, **kwargs):
    """Shape-only init + host-side numpy fill. Returns a params pytree whose
    structure/shapes/dtypes exactly match `module.init(rngs, *args)`."""
    shapes = jax.eval_shape(lambda r: module.init(r, *args, **kwargs), rngs)
    rng = np.random.default_rng(seed)

    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    filled = []
    for leaf in leaves:
        arr = (rng.standard_normal(leaf.shape) * scale).astype(
            np.float32 if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf.dtype
        )
        filled.append(jnp.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, filled)
