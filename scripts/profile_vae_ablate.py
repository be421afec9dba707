"""Ablation profile of the VAE decoder: null one op class at a time and
attribute decode time by difference (same methodology as profile_ablate.py
for the UNet step — reps inside one jitted scan, interleaved rounds,
per-variant minimum; docs/perf_notes.md "measurement corrections").

Decomposes the 512² batch-8 decode (the headline's denominator term) into
GroupNorm bandwidth / mid-block attention / conv (residual) so the "VAE
decoder MFU 47%" lever can be kept or killed by measurement: the conv
remainder is compared against the XLA cost-analysis FLOP floor.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import psd_tpu.ops.norms as norms
import psd_tpu.models.vae as vae_mod
from psd_tpu.models.vae import AutoencoderKL, VAEConfig
from psd_tpu.utils.fast_init import enable_compile_cache, fast_init

REPS = 5


def build(B, size):
    vae = AutoencoderKL(VAEConfig(dtype=jnp.bfloat16))
    lat = size // 8
    z = jax.random.normal(jax.random.PRNGKey(0), (B, lat, lat, 4), jnp.float32)
    params = fast_init(
        vae, jax.random.PRNGKey(1),
        jnp.zeros((1, size, size, 3), jnp.bfloat16), jax.random.PRNGKey(2),
    )
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )

    def loop(p, z):
        def body(c, _):
            img = vae.apply(p, c, method=vae.decode)
            return c + (img.mean() * 0).astype(c.dtype), img.mean()
        _, outs = jax.lax.scan(body, z, None, length=REPS)
        return outs.sum()

    fn = jax.jit(loop)
    return fn, params, z


def _time_once(fn, p, z):
    t0 = time.perf_counter()
    s = np.asarray(fn(p, z))
    assert np.isfinite(s), s
    return (time.perf_counter() - t0) / REPS


orig_gn = norms.GroupNorm.__call__
orig_attn = vae_mod.VAEAttention.__call__


def gn_identity(self, x, fold_only=False, shift=None):
    """Declare params (via the original on a 1×1 spatial slice), skip BOTH
    the stats and the apply pass over the full tensor."""
    if isinstance(x, (tuple, list)) or fold_only:
        return orig_gn(self, x, fold_only=fold_only, shift=shift)
    tiny = orig_gn(self, x[:, :1, :1, :], shift=shift)
    return x + tiny.mean().astype(x.dtype) * 0


def gn_stats_only(self, x, fold_only=False, shift=None):
    """Keep the stats pass (fold_only path), skip the normalize (apply)
    arithmetic. The fold result stays live via a vanishing-but-
    unsimplifiable term (bf16 cast AFTER the 1e-30 scale)."""
    if isinstance(x, (tuple, list)) or fold_only:
        return orig_gn(self, x, fold_only=fold_only, shift=shift)
    w, b = orig_gn(self, x, fold_only=True, shift=shift)
    shp = (w.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    return x + ((w + b) * 1e-30).astype(x.dtype).reshape(shp)


def attn_noop(self, x):
    orig = orig_attn(self, x[:, :8, :8, :])
    return x + orig.mean().astype(x.dtype) * 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()
    enable_compile_cache()
    print(f"devices: {jax.devices()} B={args.batch} size={args.size}")

    import flax.linen as nn

    variants = {}

    def with_patches(name, patches):
        saved = [(c, a, getattr(c, a)) for c, a, _ in patches]
        try:
            for c, a, f in patches:
                setattr(c, a, f)
            v = build(args.batch, args.size)
            # trace + compile INSIDE the patch scope (jit traces lazily)
            _time_once(*v)
            variants[name] = v
        finally:
            for c, a, o in saved:
                setattr(c, a, o)

    with_patches("full", [])
    with_patches("nogn", [(norms.GroupNorm, "__call__", gn_identity)])
    with_patches("gnstats", [(norms.GroupNorm, "__call__", gn_stats_only)])
    with_patches("noattn", [(vae_mod.VAEAttention, "__call__", attn_noop)])

    times = {n: [] for n in variants}
    for _ in range(args.rounds):
        for name, (fn, p, z) in variants.items():
            times[name].append(_time_once(fn, p, z))

    best = {n: min(ts) * 1e3 for n, ts in times.items()}
    for n, t in best.items():
        print(f"{n:10s} {t:8.2f} ms/decode")
    full = best["full"]
    gn = full - best["nogn"]
    gn_stats = best["gnstats"] - best["nogn"]
    attn = full - best["noattn"]
    conv_rest = full - gn - attn
    print(f"\nattribution (ms/batch-{args.batch} decode @ {args.size}²):")
    print(f"  GroupNorm total      {gn:7.2f}  (stats pass {gn_stats:.2f}, "
          f"apply {gn - gn_stats:.2f})")
    print(f"  mid-block attention  {attn:7.2f}")
    print(f"  convs + rest         {conv_rest:7.2f}")

    # XLA's own FLOP count for the full decode → conv MFU bound.
    # NOTE: cost_analysis counts a while-loop (scan) BODY once, not
    # ×trip-count, so the reported flops already equal ONE decode.
    fn, p, z = variants["full"]
    cost = fn.lower(p, z).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    print(f"  XLA flops/decode     {flops/1e12:7.3f} TF  -> "
          f"{flops/1e12/197*1e3:.1f} ms at 197 TFLOPS peak; conv-remainder "
          f"MFU ≈ {flops/1e12/197*1e3/max(conv_rest,1e-9)*100:.0f}%")


if __name__ == "__main__":
    main()
