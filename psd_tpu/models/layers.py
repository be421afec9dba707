"""Core neural-net layers for the SD-class UNet and VAE, in flax.linen.

TPU-first design decisions:
  * NHWC layout everywhere (XLA's native conv layout on TPU).
  * bf16 compute / fp32 params via (dtype, param_dtype) on every module.
  * Attention routing behavior (the reference's runtime processor
    monkey-patching, diffusion_module_ip.py:203-233) is STATIC module
    configuration here; `delta_scale` is a traced scalar argument.
  * GELU is exact (erf) to match torch's default, not jax's tanh approx.

Module/parameter names mirror the diffusers state-dict structure
(resnets_0.norm1, attn2.to_q, ...) so the torch→jax weight converter in
psd_tpu.convert is a mechanical key mapping.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.norms import GroupNorm
from ..ops.attention import attention_probs, dot_product_attention


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (SD convention: cos-first, freq_shift 0).

    Matches the embedding the SD v1.4 UNet was trained with (reference loads
    it via diffusers at src/models/unet/unet.py:70-75).
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """linear_1 → SiLU → linear_2 (diffusers TimestepEmbedding)."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.Dense(self.time_embed_dim, name="linear_1", **kw)(t_emb)
        h = nn.silu(h)
        return nn.Dense(self.time_embed_dim, name="linear_2", **kw)(h)


class Conv3x3(nn.Module):
    """3×3 conv whose params can be read without applying (fused kernels)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, apply: bool = True, in_features: int | None = None):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, in_features if in_features is not None else x.shape[-1],
             self.features),
            self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        if not apply:
            return kernel, bias
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(out.dtype)


class FinalConv(nn.Module):
    """3×3 conv in compute dtype with an fp32 output upcast.

    Used for the UNet/VAE output convs (4/8/3-channel outputs): N pads to
    128 MXU lanes whatever the dtype, but fp32 OPERANDS quarter the MXU
    rate. The conv runs in compute dtype (MXU accumulates fp32 internally)
    and the result is upcast to fp32 for the downstream sampler math.
    NOTE: `preferred_element_type=fp32` with bf16 operands is NOT
    differentiable in jax 0.9 (the transpose sees an fp32 cotangent vs
    bf16 operands and conv rejects mixed dtypes), so the upcast happens
    after the conv; measured perf is identical either way
    (scripts/bench_vae.py bf16-vs-fp32 final conv: 125.14 vs 125.11 ms).
    nn.Conv-compatible param tree (kernel HWIO + bias)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out.astype(jnp.float32) + bias.astype(jnp.float32)


class ResnetBlock2D(nn.Module):
    """GN→SiLU→conv → +temb → GN→SiLU→conv → +shortcut (diffusers ResnetBlock2D).

    Runs as plain XLA: a hand-fused Pallas GN→SiLU→conv chain was built and
    measured twice (round 1: parity; round 3 weight-resident rewrite: 1.56×
    SLOWER than XLA on VAE decode, its best-case shape class — 196.7 vs
    126.4 ms/batch-8 interleaved) and deleted by that measurement. XLA's
    conv fusion is the floor here (docs/perf_notes.md "fused resblock").
    """

    out_channels: int
    use_temb: bool = True
    eps: float = 1e-5
    groups: int = 32
    quant: str = "none"
    # empirical int8 win-region, per architecture (scripts/probe_int8.py):
    # "unet" — win only at ≤32² spatial (0.86× at 64²·320ch, ~2× ≤32²·≥640ch)
    # "vae"  — the SD VAE decoder's channel ladder wins at LARGE spatial:
    #          1.79-1.88× at 64²/128²·512ch, 1.57× at 256²·256ch, 1.28× at
    #          512²·128ch; loses only the 512²·256→128 transition (0.82×)
    quant_gate: str = "unet"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def _q_conv_ok(self, x) -> bool:
        """Empirical per-architecture int8 gate (see quant_gate above).
        Inference-only (round() has zero gradient)."""
        from ..core.mode import is_training

        if self.quant != "int8" or is_training():
            return False
        if self.quant_gate == "vae":
            cin = x.shape[-1]
            sp = max(x.shape[1], x.shape[2])
            return (cin >= 256 and sp <= 256) or (
                cin >= 128 and cin == self.out_channels)
        return x.shape[1] <= 32 and x.shape[2] <= 32

    @nn.compact
    def __call__(self, x, temb=None, skip=None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        in_ch = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        norm1 = GroupNorm(num_groups=self.groups, epsilon=self.eps,
                          name="norm1", **kw)
        norm2 = GroupNorm(num_groups=self.groups, epsilon=self.eps,
                          name="norm2", **kw)
        conv1 = Conv3x3(self.out_channels, name="conv1", **kw)
        conv2 = Conv3x3(self.out_channels, name="conv2", **kw)

        emb = None
        if self.use_temb:
            emb = nn.Dense(self.out_channels, name="time_emb_proj", **kw)(
                nn.silu(temb)
            )

        if (skip is not None and in_ch != self.out_channels
                and not self._q_conv_ok(x)):
            # up-path skip join WITHOUT materializing concat([x, skip]):
            # GN stats over the virtual concat (group_norm_fold_parts —
            # exact), normalize+SiLU each part in place, and run conv1 and
            # the 1×1 shortcut as split-weight convolutions (linearity:
            # conv([a|b], k) == conv(a, k[:Ca]) + conv(b, k[Ca:])). Param
            # tree/shapes are identical to the concat formulation. Saves the
            # write+reads of the concat tensor (~0.5 GB/step at 512²).
            C1 = x.shape[-1]
            w, b = norm1((x, skip))  # (B, in_ch) fp32 affine
            dt = self.dtype

            def napply(t, lo, hi):
                wv = w[:, None, None, lo:hi].astype(dt)
                bv = b[:, None, None, lo:hi].astype(dt)
                return nn.silu(t.astype(dt) * wv + bv)

            def conv_nhwc(t, k):
                return jax.lax.conv_general_dilated(
                    t, k.astype(dt), (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )

            k1, b1 = conv1(x, apply=False, in_features=in_ch)
            h = (
                conv_nhwc(napply(x, 0, C1), k1[:, :, :C1])
                + conv_nhwc(napply(skip, C1, in_ch), k1[:, :, C1:])
                + b1.astype(dt)
            )
            # h + temb folds analytically into norm2 (ops/norms.py shift)
            h = nn.silu(norm2(h, shift=emb))
            h = conv2(h)
            ks, bs = Conv1x1Params(self.out_channels, name="conv_shortcut",
                                   param_dtype=self.param_dtype)(in_ch)
            sc = (
                jnp.dot(x.astype(dt), ks[0, 0, :C1].astype(dt),
                        preferred_element_type=jnp.float32)
                + jnp.dot(skip.astype(dt), ks[0, 0, C1:].astype(dt),
                          preferred_element_type=jnp.float32)
                + bs.astype(jnp.float32)
            ).astype(dt)
            return sc + h

        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)

        if self._q_conv_ok(x):
            from ..ops.quant import qconv3x3

            h = nn.silu(norm1(x))
            k1, b1 = conv1(h, apply=False)
            h = qconv3x3(h.astype(self.dtype), k1, b1, out_dtype=self.dtype)
            if emb is not None:
                h = h + emb[:, None, None, :].astype(h.dtype)
            h = nn.silu(norm2(h))
            k2, b2 = conv2(h, apply=False)
            h = qconv3x3(h.astype(self.dtype), k2, b2, out_dtype=self.dtype)
            if in_ch != self.out_channels:
                x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut",
                            **kw)(x)
            return x + h

        h = norm1(x)
        h = nn.silu(h)
        h = conv1(h)
        # h + temb folds analytically into norm2's statistics and affine
        # (ops/norms.py group_norm_fold shift) — never materialized
        h = norm2(h, shift=emb)
        h = nn.silu(h)
        h = conv2(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut", **kw)(x)
        return x + h


class Downsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.channels,
            (3, 3),
            strides=2,
            padding=1,
            name="conv",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.upconv import upsample2x_conv3x3

        # nearest-up2 + conv fused as 4 phase convs (2×2 taps): exact math,
        # 2.25× fewer MXU taps, no 4×-sized intermediate (ops/upconv.py)
        conv = Conv3x3(self.channels, name="conv", dtype=self.dtype,
                       param_dtype=self.param_dtype)
        k, bias = conv(x, apply=False)
        return upsample2x_conv3x3(x.astype(self.dtype), k, bias,
                                  dtype=self.dtype)


@dataclass(frozen=True)
class CrossAttnMode:
    """Static routing configuration for one cross-attention site.

    kind:
      "plain"  — standard K/V over the full conditioning sequence.
      "split2" — 2-segment [AOE|IP] with post-softmax token rescale +
                 renormalize (attention_processor_base.py:103-116).
      "split3" — triple-pathway split injection: anat K/V from shared
                 weights over tokens [N_aoe:N_aoe+N_img], dis/delta K/V from
                 separate to_k_dis/to_v_dis over [:N_aoe] and [-N_delta:],
                 combined anat_gate·z_anat + dis_gate·z_dis + δ·z_delta
                 (attention_processor_routing_gates.py:129-178).
    """

    kind: str = "plain"
    num_aoe_tokens: int = 16
    num_image_tokens: int = 16
    num_delta_tokens: int = 16
    anat_gate: float = 0.5
    dis_gate: float = 0.5
    # split2 post-softmax rescale factors (reference ships 1.0/1.0 —
    # mechanism present, neutralized; attention_processor_base.py:29-37)
    scale_aoe: float = 1.0
    scale_ip: float = 1.0


class Attention(nn.Module):
    """Multi-head attention with optional split-injection routing.

    Self-attention when `context` is None. For cross-attention the static
    `mode` selects plain / split2 / split3 behavior; `delta_scale` is a
    traced scalar (0.0 at training, >0 enables steering at inference).
    """

    num_heads: int
    mode: CrossAttnMode = CrossAttnMode()
    out_bias: bool = True
    quant: str = "none"  # "int8": W8A8 MXU path for the big projections
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, delta_scale=None,
                 ln_scale=None, ln_bias=None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        inner_dim = x.shape[-1]
        head_dim = inner_dim // self.num_heads
        is_cross = context is not None
        B = x.shape[0]

        # raw projection weights (nn.Dense-compatible tree paths) so the
        # pre-attention LayerNorm can fold into the projections on TPU
        ctx_dim = context.shape[-1] if is_cross else inner_dim
        wq, _ = DenseParams(inner_dim, use_bias=False, name="to_q",
                            param_dtype=self.param_dtype)(inner_dim)
        wk, _ = DenseParams(inner_dim, use_bias=False, name="to_k",
                            param_dtype=self.param_dtype)(ctx_dim)
        wv, _ = DenseParams(inner_dim, use_bias=False, name="to_v",
                            param_dtype=self.param_dtype)(ctx_dim)
        from ..core.mode import is_training
        from ..ops.quant import quant_worthwhile

        # int8 projections only where the contraction depth pays (K=C);
        # otherwise keep the fused bf16 LN→proj Pallas path. Inference-only:
        # round() has zero gradient, so training always takes the bf16 path.
        use_q8 = (self.quant == "int8" and quant_worthwhile(inner_dim)
                  and not is_training())

        def dense(t, w, b=None):
            if use_q8:
                from ..ops.quant import qdense

                return qdense(t, w, b, out_dtype=self.dtype)
            out = jnp.dot(
                t.astype(self.dtype), w.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            if b is not None:
                out = out + b.astype(jnp.float32)
            return out.astype(self.dtype)

        def dense_sm(t, w):
            # small-operand matmul (16-48 token cross K/V): int8 buys nothing
            return jnp.dot(
                t.astype(self.dtype), w.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)

        def to_k(t):
            return dense_sm(t, wk)

        def to_v(t):
            return dense_sm(t, wv)

        def heads(t):
            return t.reshape(B, -1, self.num_heads, head_dim)

        S = x.shape[1]
        # In the model the pre-attention LayerNorm always folds in here (the
        # only model caller, BasicTransformerBlock, passes its LN params);
        # ln_scale=None (direct/unit-test calls) skips normalization but runs
        # the SAME dense()/quant projection logic — no divergent legacy path.
        from ..ops.geglu import ln_reference, ln_proj_sharded

        ws = (wq,) if is_cross else (wq, wk, wv)
        if ln_scale is None:
            outs = [dense(x.astype(self.dtype), w) for w in ws]
        elif not use_q8 and _ln_geglu_fused_ok(x):
            outs = ln_proj_sharded(
                x.reshape(B * S, inner_dim).astype(self.dtype),
                ln_scale, ln_bias, ws,
                block_m=_ln_block_m(inner_dim),
            )
            outs = [o.reshape(B, S, inner_dim) for o in outs]
        else:
            hn = ln_reference(x.astype(self.dtype), ln_scale, ln_bias)
            outs = [dense(hn, w) for w in ws]
        q = heads(outs[0])
        if is_cross:
            ctx = context
        else:
            ctx = None  # self-attn k/v come fused below
            k_self, v_self = heads(outs[1]), heads(outs[2])

        mode = self.mode if is_cross else CrossAttnMode("plain")
        if mode.kind == "split3" and is_cross:
            n_aoe, n_img, n_delta = (
                mode.num_aoe_tokens,
                mode.num_image_tokens,
                mode.num_delta_tokens,
            )
            dis_tok = ctx[:, :n_aoe, :]
            anat_tok = ctx[:, n_aoe : n_aoe + n_img, :]
            delta_tok = ctx[:, ctx.shape[1] - n_delta :, :]

            to_k_dis = nn.Dense(inner_dim, use_bias=False, name="to_k_dis", **kw)
            to_v_dis = nn.Dense(inner_dim, use_bias=False, name="to_v_dis", **kw)

            banks = (
                heads(to_k(anat_tok)), heads(to_v(anat_tok)),
                heads(to_k_dis(dis_tok)), heads(to_v_dis(dis_tok)),
                heads(to_k_dis(delta_tok)), heads(to_v_dis(delta_tok)),
            )
            dscale = (
                jnp.asarray(0.0, jnp.float32)
                if delta_scale is None
                else jnp.asarray(delta_scale, jnp.float32)
            )
            S = q.shape[1]
            use_fused = False
            if S >= 256 and S % 128 == 0:
                from ..core.mode import kernel_backend_ok

                use_fused = kernel_backend_ok()
            z = None
            if use_fused:
                from ..ops.split3 import split3_attention_sharded

                # whole-seq q blocks: the KV banks are 16 tokens, so VMEM is
                # cheap and per-invocation overhead dominated at small blocks
                # (0.37 ms/site at block 512 vs a ~0.05 ms FLOP floor).
                # Under an active mesh the kernel shard_maps itself over the
                # batch axes (None return → XLA fallback below).
                z = split3_attention_sharded(
                    q, *banks, dscale,
                    mode.anat_gate, mode.dis_gate, None, min(4096, S),
                )
            if z is None:
                z_anat = dot_product_attention(q, banks[0], banks[1])
                z_dis = dot_product_attention(q, banks[2], banks[3])
                z_delta = dot_product_attention(q, banks[4], banks[5])
                z = (
                    mode.anat_gate * z_anat
                    + mode.dis_gate * z_dis
                    + dscale.astype(z_anat.dtype) * z_delta
                )
        elif mode.kind == "split2" and is_cross:
            k, v = heads(to_k(ctx)), heads(to_v(ctx))
            probs = attention_probs(q, k)  # (B,H,Sq,Sk) fp32
            n_tok = probs.shape[-1]
            if n_tok >= mode.num_aoe_tokens + mode.num_image_tokens and (
                mode.scale_aoe != 1.0 or mode.scale_ip != 1.0
            ):
                scale_vec = jnp.ones((n_tok,), jnp.float32)
                scale_vec = scale_vec.at[: mode.num_aoe_tokens].mul(mode.scale_aoe)
                scale_vec = scale_vec.at[n_tok - mode.num_image_tokens :].mul(
                    mode.scale_ip
                )
                probs = probs * scale_vec
                probs = probs / probs.sum(axis=-1, keepdims=True)
            z = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        else:
            if ctx is None:  # self-attn with fused LN→QKV projections
                k, v = k_self, v_self
            else:
                k, v = heads(to_k(ctx)), heads(to_v(ctx))
            z = dot_product_attention(q, k, v)

        z = z.reshape(B, -1, inner_dim)
        wo, bo = DenseParams(inner_dim, use_bias=self.out_bias, name="to_out_0",
                             param_dtype=self.param_dtype)(inner_dim)
        return dense(z, wo, bo)


class DenseParams(nn.Module):
    """Declares Dense-compatible params (same tree path/shapes/init as
    nn.Dense) without applying them — consumed by fused Pallas kernels."""

    features: int
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
            self.param_dtype,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
            if self.use_bias
            else None
        )
        return k, b


class Conv1x1Params(nn.Module):
    """nn.Conv((1,1))-compatible params (kernel (1,1,Cin,Cout), bias) without
    applying — for matmul-form 1×1 convolutions (quantized or fused)."""

    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int = None):
        in_f = in_features if in_features is not None else self.features
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, in_f, self.features),
            self.param_dtype,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
        return k, b


class LayerNormParams(nn.Module):
    """nn.LayerNorm-compatible params (scale/bias) without applying."""

    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: int):
        s = self.param("scale", nn.initializers.ones, (features,),
                       self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (features,),
                       self.param_dtype)
        return s, b


def _ln_block_m(C: int) -> int:
    """Row-block for the fused LN kernels: 1024 measured ~6-8% faster than
    512 at stage-0 (fewer weight re-streams); stage-2 widths (C≥1280) keep
    512 — the fp32 LN temporaries at BM=1024×1280 would crowd VMEM."""
    return 1024 if C <= 640 else 512


def _gn_proj_fused_ok(B: int, S: int, C: int) -> bool:
    """Gate for the fused GN-affine→proj_in kernel (ops/gnproj.py):
    inference-only (its VJP re-derives through XLA reference math, redundant
    under remat — same rationale as the LN kernels), TPU backend, and
    block-aligned shapes. Under an active mesh the kernel shard_maps over
    the batch axes (gn_proj_sharded), so per-shard batch must divide."""
    from ..core.mode import is_training, kernel_disabled
    from ..parallel.mesh import kernel_batch_axes

    if is_training() or kernel_disabled("gnproj"):
        return False
    if S % 64 or C % 64:
        return False
    info = kernel_batch_axes()
    if info is not None and B % info[2]:
        return False
    from ..core.mode import kernel_backend_ok

    return kernel_backend_ok()


def _ln_geglu_fused_ok(x) -> bool:
    from ..core.mode import is_training
    from ..parallel.mesh import kernel_batch_axes

    if is_training():
        # the fused LN kernels' VJPs re-derive through XLA reference math;
        # under remat that adds a redundant fused-forward pass — training
        # uses the plain XLA path end to end (core/mode.py)
        return False
    M = x.shape[0] * x.shape[1]
    info = kernel_batch_axes()
    if info is not None:
        # kernels shard_map over the batch axes (ops/geglu.py *_sharded):
        # the per-shard row count must stay block-aligned
        n = info[2]
        if x.shape[0] % n:
            return False
        M //= n
    if M % 512 or x.shape[-1] % 64:
        return False
    from ..core.mode import kernel_backend_ok

    return kernel_backend_ok()


class GEGLUFeedForward(nn.Module):
    """FF body: GEGLU proj (dim→8·dim split) → Dense (4·dim→dim).

    When the preceding LayerNorm's params are passed in (ln_scale/ln_bias),
    LN + projection + split·gelu·mul run as ONE Pallas kernel on TPU
    (ops/geglu.py) — the 8·dim-wide intermediate never touches HBM."""

    mult: int = 4
    quant: str = "none"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ln_scale=None, ln_bias=None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        dim = x.shape[-1]
        from ..core.mode import is_training
        from ..ops.geglu import ln_geglu, ln_reference
        from ..ops.quant import quant_worthwhile

        use_q8 = self.quant == "int8" and not is_training()
        # net_0 contracts over dim, net_2 over 4·dim: quantize each only
        # where the depth pays (MIN_QUANT_K); a bf16-net_0 int8-net_2 mix
        # keeps the fused LN→GEGLU kernel for the shallow stage-0 width.
        q8_net0 = use_q8 and quant_worthwhile(dim)
        q8_net2 = use_q8 and quant_worthwhile(dim * self.mult)
        if ln_scale is None and not use_q8:
            # legacy path: caller already normalized
            h = nn.Dense(dim * self.mult * 2, name="net_0_proj", **kw)(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * gelu(gate)
            return nn.Dense(dim, name="net_2", **kw)(h)

        w0, b0 = DenseParams(
            dim * self.mult * 2, name="net_0_proj",
            param_dtype=self.param_dtype,
        )(dim)
        B, S, _ = x.shape

        def normed():
            if ln_scale is None:
                return x.astype(self.dtype)
            return ln_reference(x.astype(self.dtype), ln_scale, ln_bias)

        def geglu_of(proj):  # proj fp32 (..., 8·dim) → (..., 4·dim) dtype
            hh, gate = jnp.split(proj, 2, axis=-1)
            return (hh * gelu(gate)).astype(self.dtype)

        if q8_net0 or (use_q8 and ln_scale is None):
            from ..ops.quant import qdense

            h = geglu_of(qdense(normed(), w0, b0, out_dtype=jnp.float32))
        elif ln_scale is not None and _ln_geglu_fused_ok(x):
            from ..ops.geglu import ln_geglu_sharded

            h = ln_geglu_sharded(
                x.reshape(B * S, dim).astype(self.dtype),
                ln_scale, ln_bias, w0, b0,
                block_m=_ln_block_m(dim),
            ).reshape(B, S, dim * self.mult)
        else:
            from ..parallel.mesh import constrain_tp_geglu, tp_active

            if tp_active():
                # tp-aware GEGLU: project the [h|g] halves as two dots
                # against a (dim, 2, 4·dim) kernel view sharded on its last
                # dim — both halves land on the same rank, h·gelu(g) stays
                # rank-local, net_2's row-parallel spec psums (mesh.py
                # constrain_tp_geglu). Same reductions, same math.
                N = dim * self.mult
                w3 = constrain_tp_geglu(
                    w0.reshape(dim, 2, N).astype(self.dtype)
                )
                b2 = b0.reshape(2, N).astype(jnp.float32)
                xn = normed()
                hh = jnp.dot(xn, w3[:, 0],
                             preferred_element_type=jnp.float32) + b2[0]
                gg = jnp.dot(xn, w3[:, 1],
                             preferred_element_type=jnp.float32) + b2[1]
                h = (hh * gelu(gg)).astype(self.dtype)
            else:
                h = geglu_of(
                    jnp.dot(normed(), w0.astype(self.dtype),
                            preferred_element_type=jnp.float32)
                    + b0.astype(jnp.float32)
                )

        if q8_net2 or (use_q8 and ln_scale is None):
            from ..ops.quant import qdense

            w2, b2 = DenseParams(dim, name="net_2",
                                 param_dtype=self.param_dtype)(dim * self.mult)
            return qdense(h, w2, b2, out_dtype=self.dtype)
        return nn.Dense(dim, name="net_2", **kw)(h)


class BasicTransformerBlock(nn.Module):
    """LN→self-attn→LN→cross-attn→LN→GEGLU-FF, all residual.

    `tome`/`hw`: optional ToMe token merging (ops/tome.py) — the merge is
    computed ONCE from the block input and applied around the configured
    residual branches (self-attn always; cross-attn q / FF per spec),
    exactly the ToMe-SD composition (arXiv:2303.17098). Inference-only and
    off by default (tome.ratio=0 leaves this function byte-identical)."""

    num_heads: int
    mode: CrossAttnMode = CrossAttnMode()
    quant: str = "none"
    tome: "object" = None  # ToMeSpec | None
    hw: tuple | None = None  # (H, W) spatial extent of the token grid
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, delta_scale=None):
        # LayerNorms fold into the attention QKV projections / FF GEGLU
        # kernels on TPU (ops/geglu.py); param tree matches nn.LayerNorm.
        from ..core.mode import is_training

        C = x.shape[-1]
        S = x.shape[1]
        mi = None
        if (
            self.tome is not None
            and self.hw is not None
            and self.tome.active(S)
            and not is_training()
        ):
            from ..ops.tome import build_merge, merge, unmerge

            mi = build_merge(x, self.hw[0], self.hw[1], self.tome.r_count(S))

        block_resident = mi is not None and self.tome.mode == "block"
        if block_resident:
            # ONE merge for the whole block: every branch below sees the
            # merged length; the single unmerge happens at the end
            x = merge(x, mi)

        def branch(fn, t, merged):
            if mi is None or block_resident or not merged:
                return fn(t)
            return unmerge(fn(merge(t, mi)), mi)

        s1, b1 = LayerNormParams(name="norm1", param_dtype=self.param_dtype)(C)
        attn1 = Attention(self.num_heads, name="attn1", quant=self.quant,
                          dtype=self.dtype, param_dtype=self.param_dtype)
        x = x + branch(lambda t: attn1(t, ln_scale=s1, ln_bias=b1), x, True)

        s2, b2 = LayerNormParams(name="norm2", param_dtype=self.param_dtype)(C)
        attn2 = Attention(
            self.num_heads,
            mode=self.mode,
            name="attn2",
            quant=self.quant,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        x = x + branch(
            lambda t: attn2(t, context=context, delta_scale=delta_scale,
                            ln_scale=s2, ln_bias=b2),
            x, self.tome.merge_cross if mi is not None else False,
        )
        # norm3 is folded into the FF's fused LN→GEGLU kernel on TPU
        s3, b3 = LayerNormParams(name="norm3", param_dtype=self.param_dtype)(
            x.shape[-1]
        )
        ff = GEGLUFeedForward(name="ff", quant=self.quant, dtype=self.dtype,
                              param_dtype=self.param_dtype)
        x = x + branch(
            lambda t: ff(t, s3, b3), x,
            self.tome.merge_mlp if mi is not None else False,
        )
        if block_resident:
            # kept tokens carry their own residual stream through the whole
            # block; merged tokens take their region dst's output (original-
            # ViT-ToMe semantics) — that substitution is the approximation.
            x = unmerge(x, mi)
        return x


class Transformer2D(nn.Module):
    """GN → conv1x1 in → transformer block(s) → conv1x1 out → +residual."""

    num_heads: int
    depth: int = 1
    mode: CrossAttnMode = CrossAttnMode()
    quant: str = "none"
    tome: "object" = None  # ToMeSpec | None
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, delta_scale=None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        B, H, W, C = x.shape
        residual = x
        from ..core.mode import is_training

        use_q8 = self.quant == "int8" and not is_training()
        norm = GroupNorm(num_groups=32, epsilon=1e-6, name="norm", **kw)

        def conv1x1(t, name):
            # 1×1 conv ≡ matmul over flattened pixels; nn.Conv-compatible tree
            k = Conv1x1Params(C, name=name, param_dtype=self.param_dtype)
            kernel, bias = k()
            if use_q8:
                from ..ops.quant import qdense

                flat = t.reshape(-1, t.shape[-1])
                out = qdense(flat, kernel.reshape(t.shape[-1], C), bias,
                             out_dtype=self.dtype)
                return out.reshape(t.shape[:-1] + (C,))
            out = jnp.dot(
                t.astype(self.dtype).reshape(-1, t.shape[-1]),
                kernel.reshape(t.shape[-1], C).astype(self.dtype),
                preferred_element_type=jnp.float32,
            ) + bias.astype(jnp.float32)
            return out.astype(self.dtype).reshape(t.shape[:-1] + (C,))

        h = None
        if not use_q8 and _gn_proj_fused_ok(B, H * W, C):
            # folded-GN affine + proj_in as ONE Pallas kernel: the normalized
            # tensor never touches HBM (ops/gnproj.py); stats stay the
            # lane-aligned one-pass fold (ops/norms.py)
            from ..ops.gnproj import gn_proj_sharded

            kin, bin_ = Conv1x1Params(C, name="proj_in",
                                      param_dtype=self.param_dtype)()
            wf, bf = norm(x, fold_only=True)
            bm = next(
                m for m in (_ln_block_m(C), 512, 256, 128, 64)
                if (H * W) % m == 0
            )
            outs = gn_proj_sharded(
                x.reshape(B, H * W, C).astype(self.dtype), wf, bf,
                (kin.reshape(C, C),), (bin_,), block_m=bm,
            )
            if outs is not None:
                h = outs[0]
        if h is None:
            h = conv1x1(norm(x), "proj_in")
            h = h.reshape(B, H * W, C)
        for d in range(self.depth):
            h = BasicTransformerBlock(
                self.num_heads,
                mode=self.mode,
                name=f"transformer_blocks_{d}",
                quant=self.quant,
                tome=self.tome,
                hw=(H, W),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(h, context, delta_scale)
        h = h.reshape(B, H, W, C)
        h = conv1x1(h, "proj_out")
        return h + residual
