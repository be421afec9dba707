"""Ablation profile of the UNet step: null out one sublayer kind at a time
and attribute step time by difference. Ground-truth replacement for trace
profiling (unavailable through the axon relay).

Each variant monkeypatches a layer class's __call__ to a shape-preserving
no-op, recompiles, and times a 10-step in-jit scan.
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

import psd_tpu.models.layers as L
from psd_tpu.models.unet import UNet2DCondition, sd14_unet_config
from psd_tpu.utils.fast_init import enable_compile_cache, fast_init


def _sync_time(fn_jitted, *args, iters=3):
    check = jax.jit(lambda t: t.astype(jnp.float32).sum())
    np.asarray(check(fn_jitted(*args)))
    np.asarray(check(fn_jitted(*args)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = np.asarray(check(fn_jitted(*args)))
        assert np.isfinite(s), s
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


PHASE = "full"  # "full" | "shallow" (DeepCache non-key step)
TOME = 0.0
TOME_MODE = "branch"


def time_unet(B, reps=10):
    cfg = sd14_unet_config(attn_mode="split3", tome_ratio=TOME,
                           tome_mode=TOME_MODE)
    unet = UNet2DCondition(cfg)
    lat = jnp.zeros((1, 64, 64, 4), jnp.bfloat16)
    t0 = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 48, 768), jnp.bfloat16)
    params = fast_init(unet, {"params": jax.random.PRNGKey(0)}, lat, t0, ctx, 0.0)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)

    x = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 4)).astype(jnp.bfloat16)
    tt = jnp.full((B,), 500, jnp.int32)
    c = jax.random.normal(jax.random.PRNGKey(2), (B, 48, 768)).astype(jnp.bfloat16)

    if PHASE == "shallow":
        # the DeepCache branch feature: input to the LAST up block
        ch = cfg.block_out_channels[1]  # 640 after up block 2's upsampler
        cache = jax.random.normal(
            jax.random.PRNGKey(3), (B, 64, 64, ch)).astype(jnp.bfloat16)

        def loop(p, x, tt, c):
            def body(carry, _):
                out = unet.apply(p, carry, tt, c, 0.5, phase="shallow",
                                 cached=cache)
                return out.astype(carry.dtype), None
            out, _ = jax.lax.scan(body, x, None, length=reps)
            return out
    else:
        def loop(p, x, tt, c):
            def body(carry, _):
                return unet.apply(p, carry, tt, c, 0.5).astype(carry.dtype), None
            out, _ = jax.lax.scan(body, x, None, length=reps)
            return out

    return _sync_time(jax.jit(loop), params, x, tt, c) / reps


OVERHEAD_FIX = None


def run_variant(name, B, patches):
    """patches: list of (cls, attr, fn). Param structure must be unchanged —
    the no-op bodies still declare the same submodules/params they skip."""
    saved = [(cls, attr, getattr(cls, attr)) for cls, attr, _ in patches]
    try:
        for cls, attr, fn in patches:
            setattr(cls, attr, fn)
        t = time_unet(B)
    finally:
        for cls, attr, orig in saved:
            setattr(cls, attr, orig)
    print(f"{name:28s} {t*1e3:8.2f} ms/step")
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--variants", default="full,noself,nocross,noff,notrans,nores")
    ap.add_argument("--phase", default="full", choices=["full", "shallow"],
                    help="'shallow' profiles the DeepCache non-key step "
                         "(conv_in -> down0 -> last up block -> out)")
    ap.add_argument("--tome", type=float, default=0.0)
    ap.add_argument("--tome-mode", default="branch",
                    choices=["branch", "block"])
    args = ap.parse_args()
    global PHASE, TOME, TOME_MODE
    PHASE, TOME, TOME_MODE = args.phase, args.tome, args.tome_mode
    enable_compile_cache()
    print(f"devices: {jax.devices()} batch {args.batch}")
    B = args.batch
    want = args.variants.split(",")

    import flax.linen as nn

    orig_attn = L.Attention.__call__
    orig_ff = L.GEGLUFeedForward.__call__
    orig_trans = L.Transformer2D.__call__
    orig_res = L.ResnetBlock2D.__call__

    def attn_no_self(self, x, context=None, delta_scale=None,
                     ln_scale=None, ln_bias=None):
        if context is None:
            # keep params: declare then discard (flax requires same structure)
            orig = orig_attn(self, x[:1, :1], None, delta_scale,
                             ln_scale, ln_bias)
            return jnp.zeros_like(x) + orig.mean() * 0
        return orig_attn(self, x, context, delta_scale, ln_scale, ln_bias)

    def attn_no_cross(self, x, context=None, delta_scale=None,
                      ln_scale=None, ln_bias=None):
        if context is not None:
            orig = orig_attn(self, x[:1, :1], context[:1, :1], delta_scale,
                             ln_scale, ln_bias)
            return jnp.zeros_like(x) + orig.mean() * 0
        return orig_attn(self, x, context, delta_scale, ln_scale, ln_bias)

    def ff_noop(self, x, ln_scale=None, ln_bias=None):
        orig = orig_ff(self, x[:1, :1], ln_scale, ln_bias)
        return jnp.zeros_like(x) + orig.mean() * 0

    def trans_noop(self, x, context, delta_scale=None):
        orig = orig_trans(self, x[:1, :1, :1], context[:1, :1], delta_scale)
        return x + orig.mean().astype(x.dtype) * 0

    def res_light(self, x, temb=None, skip=None):
        orig = orig_res(self, x[:, :8, :8, :], temb,
                        None if skip is None else skip[:, :8, :8, :])
        pad = jnp.zeros(x.shape[:-1] + (orig.shape[-1],), x.dtype)
        return pad + orig.mean().astype(x.dtype) * 0

    orig_down = L.Downsample2D.__call__
    orig_up = L.Upsample2D.__call__
    orig_final = L.FinalConv.__call__
    orig_temb = L.TimestepEmbedding.__call__

    def down_noop(self, x):
        # SD downsamplers keep channel count: a strided slice is shape-exact
        orig = orig_down(self, x[:, :8, :8, :])
        return x[:, ::2, ::2, :] + orig.mean().astype(x.dtype) * 0

    def up_noop(self, x):
        orig = orig_up(self, x[:, :8, :8, :])
        b, h, w, c = x.shape
        rep = jnp.broadcast_to(
            x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
        ).reshape(b, 2 * h, 2 * w, c)
        return rep + orig.mean().astype(x.dtype) * 0

    def final_noop(self, x):
        orig = orig_final(self, x[:, :8, :8, :])
        return (
            jnp.zeros(x.shape[:-1] + (self.features,), jnp.float32)
            + orig.mean() * 0
        )

    def temb_noop(self, t_emb):
        orig = orig_temb(self, t_emb[:1])
        return (
            jnp.zeros(t_emb.shape[:-1] + (self.time_embed_dim,), orig.dtype)
            + orig.mean() * 0
        )

    # compact marker so flax treats the patched bodies like the originals
    attn_no_self = nn.compact(attn_no_self)
    attn_no_cross = nn.compact(attn_no_cross)
    ff_noop = nn.compact(ff_noop)
    trans_noop = nn.compact(trans_noop)
    res_light = nn.compact(res_light)

    if "full" in want:
        run_variant("full", B, [])
    if "noself" in want:
        run_variant("self-attn nulled", B, [(L.Attention, "__call__", attn_no_self)])
    if "nocross" in want:
        run_variant("cross-attn nulled", B, [(L.Attention, "__call__", attn_no_cross)])
    if "noff" in want:
        run_variant("FF nulled", B, [(L.GEGLUFeedForward, "__call__", ff_noop)])
    if "notrans" in want:
        run_variant("transformer nulled", B, [(L.Transformer2D, "__call__", trans_noop)])
    if "nores" in want:
        run_variant("resblocks tiny(8x8)", B, [(L.ResnetBlock2D, "__call__", res_light)])
    if "noupdown" in want:
        run_variant("up/down-samplers nulled", B, [
            (L.Downsample2D, "__call__", nn.compact(down_noop)),
            (L.Upsample2D, "__call__", nn.compact(up_noop)),
        ])
    if "noio" in want:
        run_variant("conv_out+temb nulled", B, [
            (L.FinalConv, "__call__", nn.compact(final_noop)),
            (L.TimestepEmbedding, "__call__", nn.compact(temb_noop)),
        ])


if __name__ == "__main__":
    main()
