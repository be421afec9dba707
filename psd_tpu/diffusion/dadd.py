"""DADD model assembly — TPU-native counterpart of the reference's
`DiffusionModuleWithIP` (src/models/diffusion_module_ip.py) and base
`DiffusionModule` (src/models/diffusion_module.py).

Split into:
  * `DADDCore` — ONE flax module over all trainable parts (UNet, ordinal
    embedder, image projection, purifier) so the optimizer sees a single
    pytree; frozen VAE/CLIP params live outside it.
  * `DADD` — orchestrator exposing pure jittable functions: train loss
    (min-SNR MSE with per-sample image-CFG dropout,
    diffusion_module_ip.py:392-462), conditioning prep for train and
    inference (:334-381 / inference_pipeline_ip.py:232-308), and DDIM
    sampling through psd_tpu.diffusion.sampler.

Conditioning layouts:
  routing gates ON : [Source_AOE(N) | E_clean(N) | Delta(N)]  (3-segment)
  routing gates OFF: [AOE(N) | Image(N)]                      (2-segment)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..conditioning import (
    AdditiveOrdinalEmbedder,
    BasicOrdinalEmbedder,
    FeaturePurifier,
    ImageProjection,
    ImageProjectionPlus,
)
from ..core.config import Config
from ..models.clip import CLIPVisionConfig, CLIPVisionTower, clip_vit_l14_config
from ..models.unet import UNetConfig, UNet2DCondition
from ..models.vae import AutoencoderKL, VAEConfig, sample_gaussian
from .sampler import SamplerConfig, cfg_eps_fn, ddim_sample, dpm_sample
from .schedule import NoiseSchedule


@dataclass(frozen=True)
class DADDCoreConfig:
    unet: UNetConfig
    embedding_dim: int = 768
    conditioning_dim: int = 768
    num_classes: int = 4
    num_aoe_tokens: int = 16
    num_image_tokens: int = 16
    aoe_delta_scale: float = 0.05
    embedder_type: str = "aoe"  # "aoe" | "boe"
    use_image_projection_plus: bool = True
    use_feature_purifier: bool = True
    use_routing_gates: bool = True
    purifier_num_heads: int = 8
    purifier_ff_mult: int = 2
    clip_hidden_dim: int = 1024
    clip_projection_dim: int = 768
    use_image_conditioning: bool = True


class DADDCore(nn.Module):
    cfg: DADDCoreConfig

    def setup(self):
        c = self.cfg
        self.unet = UNet2DCondition(c.unet, name="unet")
        if c.embedder_type == "aoe":
            self.ordinal_embedder = AdditiveOrdinalEmbedder(
                num_classes=c.num_classes,
                embedding_dim=c.embedding_dim,
                delta_scale=c.aoe_delta_scale,
                num_tokens=c.num_aoe_tokens,
                name="ordinal_embedder",
            )
        else:
            self.ordinal_embedder = BasicOrdinalEmbedder(
                num_classes=c.num_classes,
                embedding_dim=c.embedding_dim,
                name="ordinal_embedder",
            )
        if c.use_image_conditioning:
            if c.use_image_projection_plus:
                self.image_projection = ImageProjectionPlus(
                    clip_hidden_dim=c.clip_hidden_dim,
                    cross_attention_dim=c.conditioning_dim,
                    num_tokens=c.num_image_tokens,
                    name="image_projection",
                )
            else:
                self.image_projection = ImageProjection(
                    cross_attention_dim=c.conditioning_dim,
                    num_tokens=c.num_image_tokens,
                    name="image_projection",
                )
            if c.use_feature_purifier:
                self.feature_purifier = FeaturePurifier(
                    dim=c.conditioning_dim,
                    num_heads=c.purifier_num_heads,
                    ff_mult=c.purifier_ff_mult,
                    name="feature_purifier",
                )

    # ---- conditioning -------------------------------------------------
    def embed_ordinal(self, labels, is_training=False, rng=None):
        out = self.ordinal_embedder(labels, is_training=is_training, rng=rng)
        if out.ndim == 2:
            out = out[:, None, :]
        return out

    def prepare_conditioning(
        self,
        labels: jnp.ndarray,  # target labels (B,)
        clip_feats: Optional[jnp.ndarray],  # (B,Dclip) or (B,S,Dh) for plus
        source_labels: Optional[jnp.ndarray] = None,
        is_training: bool = False,
        zero_aoe: bool = False,  # CFG uncond pass: negative embedding
        image_scale: float | jnp.ndarray = 1.0,
        drop_image_mask: Optional[jnp.ndarray] = None,  # (B,) bool
        rng=None,
        leace: Optional[Dict[str, Any]] = None,  # P_null/mu arrays
    ) -> jnp.ndarray:
        c = self.cfg
        src = labels if source_labels is None else source_labels

        if zero_aoe:
            target_aoe = self.ordinal_embedder.negative(labels, is_training)
        else:
            target_aoe = self.ordinal_embedder(labels, is_training=is_training, rng=rng)
        if target_aoe.ndim == 2:
            target_aoe = target_aoe[:, None, :]

        if not c.use_image_conditioning or clip_feats is None:
            # base (non-IP) module: ordinal tokens only
            return target_aoe

        source_aoe = self.ordinal_embedder(src, is_training=is_training, rng=rng)
        if source_aoe.ndim == 2:
            source_aoe = source_aoe[:, None, :]

        image_embeds = self.image_projection(clip_feats)
        if leace is not None:
            from ..conditioning.leace import apply_leace

            image_embeds = apply_leace(image_embeds, leace)
        if c.use_feature_purifier:
            image_embeds = self.feature_purifier(image_embeds, source_aoe)
        image_embeds = image_embeds * image_scale

        if drop_image_mask is not None:
            image_embeds = jnp.where(
                drop_image_mask[:, None, None], 0.0, image_embeds
            )

        if c.use_routing_gates:
            # delta tokens: zero at training (source == target); at inference
            # the caller passes the true delta via prepare_inference_cond.
            delta = self.ordinal_embedder.ordinal_delta(src, labels)
            combined = jnp.concatenate([source_aoe, image_embeds, delta], axis=1)
        else:
            combined = jnp.concatenate([target_aoe, image_embeds], axis=1)
        from ..parallel.mesh import constrain_batch

        return constrain_batch(combined)

    def eps(self, latents, t, cond, delta_scale=0.0):
        return self.unet(latents, t, cond, delta_scale)

    def eps_encode(self, latents, t, cond, delta_scale=0.0):
        """UNet down+mid only → (h_mid, skips) for encoder-propagation
        sampling (arXiv:2312.09608; models/unet.py phase='encode')."""
        return self.unet(latents, t, cond, delta_scale, phase="encode")

    def eps_decode(self, t, cond, cached, delta_scale=0.0):
        """UNet up+out from cached encoder features, fresh t embedding."""
        B = t.shape[0]
        dummy = jnp.zeros((B, 1, 1, self.cfg.unet.in_channels), jnp.float32)
        return self.unet(dummy, t, cond, delta_scale, phase="decode",
                         cached=cached)

    def eps_deep(self, latents, t, cond, delta_scale=0.0):
        """Full forward that ALSO returns the DeepCache branch feature
        (models/unet.py phase='deep'; arXiv:2310.01407) → (eps, deep)."""
        return self.unet(latents, t, cond, delta_scale, phase="deep")

    def eps_shallow(self, latents, t, cond, cached, delta_scale=0.0):
        """Shallow path (conv_in → down0 → last up block ← cached) → eps."""
        return self.unet(latents, t, cond, delta_scale, phase="shallow",
                         cached=cached)

    def __call__(self, latents, t, labels, clip_feats=None, delta_scale=0.0):
        cond = self.prepare_conditioning(labels, clip_feats)
        return self.unet(latents, t, cond, delta_scale)


def core_config_from(cfg: Config, remat: Optional[bool] = None,
                     dtype=jnp.bfloat16, quant: str = "none",
                     tome_ratio: float = 0.0,
                     tome_mode: str = "branch") -> DADDCoreConfig:
    """Build a DADDCoreConfig from a reference-format Config."""
    m = cfg.model
    attn_mode = "split3" if m.use_routing_gates else "split2"
    unet = UNetConfig(
        in_channels=m.latent_channels,
        out_channels=m.latent_channels,
        block_out_channels=tuple(m.block_out_channels),
        layers_per_block=2,
        num_heads=m.attention_heads,
        cross_attention_dim=m.conditioning_dim,
        attn_mode=attn_mode,
        num_aoe_tokens=m.num_aoe_tokens,
        num_image_tokens=m.num_image_tokens,
        num_delta_tokens=m.num_aoe_tokens,
        use_frequency_strategy=m.use_frequency_strategy,
        gate_init_anatomy=m.gate_init_anatomy,
        gate_init_disease=m.gate_init_disease,
        remat=cfg.training.gradient_checkpointing if remat is None else remat,
        quant=quant,
        tome_ratio=tome_ratio,
        tome_mode=tome_mode,
        dtype=dtype,
    )
    return DADDCoreConfig(
        unet=unet,
        embedding_dim=m.embedding_dim,
        conditioning_dim=m.conditioning_dim,
        num_classes=m.ordinal_embedder.num_classes,
        num_aoe_tokens=m.num_aoe_tokens,
        num_image_tokens=m.num_image_tokens,
        aoe_delta_scale=m.ordinal_embedder.delta_scale,
        embedder_type=m.ordinal_embedder.type,
        use_image_projection_plus=m.use_image_projection_plus,
        use_feature_purifier=m.use_feature_purifier,
        use_routing_gates=m.use_routing_gates,
        purifier_num_heads=m.purifier_num_heads,
        purifier_ff_mult=m.purifier_ff_mult,
    )


class DADD:
    """Orchestrator: owns configs + schedule, provides pure jittable fns.

    Frozen encoders (VAE, CLIP) are separate modules with their own param
    trees; the optimizer only ever touches `core` params (the reference
    freezes VAE/CLIP the same way, diffusion_module_ip.py:119-135).
    """

    def __init__(
        self,
        cfg: Config,
        core_cfg: Optional[DADDCoreConfig] = None,
        vae_cfg: Optional[VAEConfig] = None,
        clip_cfg: Optional[CLIPVisionConfig] = None,
        dtype=jnp.bfloat16,
    ):
        self.cfg = cfg
        self.core_cfg = core_cfg or core_config_from(cfg, dtype=dtype)
        self.core = DADDCore(self.core_cfg)
        self.vae_cfg = vae_cfg or VAEConfig(dtype=dtype)
        self.vae = AutoencoderKL(self.vae_cfg)
        self.clip_cfg = clip_cfg or clip_vit_l14_config(dtype=dtype)
        self.clip = CLIPVisionTower(self.clip_cfg)
        self.schedule = NoiseSchedule(
            num_train_timesteps=cfg.diffusion.num_train_timesteps,
            beta_start=cfg.diffusion.beta_start,
            beta_end=cfg.diffusion.beta_end,
            kind=cfg.diffusion.noise_schedule,
        )
        self.latent_scale = cfg.diffusion.latent_scale
        # spatial downscale factor of the VAE (8 for SD; tiny configs differ)
        self.spatial_factor = 2 ** (len(self.vae_cfg.block_out_channels) - 1)

    # ---- initialization ------------------------------------------------
    def init_core(self, rng, image_size: int = 256) -> Dict:
        lat = image_size // self.spatial_factor
        B = 1
        latents = jnp.zeros((B, lat, lat, self.core_cfg.unet.in_channels))
        t = jnp.zeros((B,), jnp.int32)
        labels = jnp.zeros((B,))
        clip_feats = self._dummy_clip_feats(B)
        return self.core.init(
            {"params": rng, "noise": rng}, latents, t, labels, clip_feats, 0.0
        )

    def _dummy_clip_feats(self, B):
        if not self.core_cfg.use_image_conditioning:
            return None
        if self.core_cfg.use_image_projection_plus:
            n_pos = self.clip_cfg.num_positions
            return jnp.zeros((B, n_pos, self.core_cfg.clip_hidden_dim))
        return jnp.zeros((B, self.core_cfg.clip_projection_dim))

    # ---- frozen encoders ------------------------------------------------
    # Each is a cached jit with params as ARGUMENTS (never closures — a
    # closed-over param tree becomes HLO constants and wrecks compile time).
    def _jit(self, name, fn):
        from ..core.mode import is_training

        # is_training() is consulted at TRACE time by kernel dispatch sites
        # (core/mode.py) — it must be part of the cache key, or a function
        # traced in one mode silently keeps the other mode's kernel set.
        key = (name, is_training())
        cache = getattr(self, "_fn_cache", None)
        if cache is None:
            cache = {}
            self._fn_cache = cache
        if key not in cache:
            cache[key] = jax.jit(fn)
        return cache[key]

    def encode_image_clip(self, clip_params, clip_images):
        """CLIP-preprocessed (B,224,224,3) → feats for the projection."""
        method = (
            self.clip.last_hidden_state
            if self.core_cfg.use_image_projection_plus
            else self.clip.image_embeds
        )

        def _fn(p, x):
            return self.clip.apply(p, x, method=method).astype(jnp.float32)

        return jax.lax.stop_gradient(self._jit("clip_encode", _fn)(clip_params, clip_images))

    def encode_latents(self, vae_params, images, rng):
        """images (B,H,W,3) in [-1,1] → sampled scaled latents (fp32)."""

        def _fn(p, x, key):
            mean, logvar = self.vae.apply(p, x, method=self.vae.encode)
            z = sample_gaussian(mean, logvar, key)
            return z.astype(jnp.float32) * self.latent_scale

        return jax.lax.stop_gradient(self._jit("vae_encode", _fn)(vae_params, images, rng))

    def decode_latents(self, vae_params, latents):
        """scaled latents → images in [0,1]."""

        def _fn(p, z):
            imgs = self.vae.apply(p, z / self.latent_scale, method=self.vae.decode)
            return jnp.clip(imgs.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

        return self._jit("vae_decode", _fn)(vae_params, latents)

    # ---- training loss ---------------------------------------------------
    def train_loss(
        self,
        core_params,
        batch: Dict[str, jnp.ndarray],  # latents (B,h,w,4) fp32 scaled,
                                        # labels (B,), clip_feats
        rng: jax.Array,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Min-SNR-weighted eps-MSE with per-sample image-CFG dropout.

        Mirrors diffusion_module_ip.py:392-462 (and the base module's
        noise-offset / input-perturbation options, diffusion_module.py:
        214-258). Latents are pre-encoded (the VAE is frozen; encoding
        happens in the data/step pipeline so this fn stays UNet-centric).
        """
        tcfg, dcfg = self.cfg.training, self.cfg.diffusion
        latents = batch["latents"]
        labels = batch["labels"]
        clip_feats = batch.get("clip_feats")
        B = latents.shape[0]

        r_noise, r_t, r_drop, r_embed, r_offset, r_perturb = jax.random.split(rng, 6)
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        if tcfg.noise_offset > 0:
            noise = noise + tcfg.noise_offset * jax.random.normal(
                r_offset, (B, 1, 1, latents.shape[-1]), jnp.float32
            )
        t = jax.random.randint(r_t, (B,), 0, dcfg.num_train_timesteps)

        if tcfg.input_perturbation > 0:
            q_noise = noise + tcfg.input_perturbation * jax.random.normal(
                r_perturb, noise.shape, jnp.float32
            )
        else:
            q_noise = noise
        noisy = self.schedule.q_sample(latents, t, q_noise)

        drop_prob = self.cfg.model.cfg_drop_prob
        drop_mask = None
        if clip_feats is not None:
            drop_mask = jax.random.uniform(r_drop, (B,)) < drop_prob

        cond = self.core.apply(
            core_params,
            labels,
            clip_feats,
            None,
            True,  # is_training
            False,  # zero_aoe
            1.0,
            drop_mask,
            method=self.core.prepare_conditioning,
            rngs={"noise": r_embed},
        )

        eps_pred = self.core.apply(
            core_params, noisy, t, cond, 0.0, method=self.core.eps
        )

        per_sample = jnp.mean(
            (eps_pred.astype(jnp.float32) - noise) ** 2, axis=(1, 2, 3)
        )
        if tcfg.use_min_snr_weighting:
            w = self.schedule.min_snr_weight(t, dcfg.min_snr_gamma)
        else:
            w = jnp.ones_like(per_sample)
        loss = jnp.mean(w * per_sample)
        metrics = {
            "loss": loss,
            "loss_base": per_sample.mean(),
            "min_snr_weight_mean": w.mean(),
        }
        if drop_mask is not None:
            metrics["cfg_drop_rate"] = drop_mask.astype(jnp.float32).mean()
        return loss, metrics

    # ---- inference -------------------------------------------------------
    def prepare_inference_cond(
        self,
        core_params,
        target_labels,
        source_labels,
        clip_feats,
        image_scale=1.0,
        zero_aoe: bool = False,
        zero_image: bool = False,
        leace: Optional[Dict[str, Any]] = None,
    ):
        """Inference conditioning (inference_pipeline_ip.py:232-308)."""
        B = target_labels.shape[0]
        drop_mask = jnp.ones((B,), bool) if zero_image else None
        use_leace = leace is not None
        leace_args = (
            {"P_null": jnp.asarray(leace["P_null"]), "mu": jnp.asarray(leace["mu"])}
            if use_leace
            else {"P_null": jnp.zeros((0,)), "mu": jnp.zeros((0,))}
        )

        def _fn(p, tgt, src, feats, scale, mask, lc):
            return self.core.apply(
                p, tgt, feats, src, False, zero_aoe, scale, mask, None,
                lc if use_leace else None,
                method=self.core.prepare_conditioning,
            )

        name = f"prep_cond_{zero_aoe}_{zero_image}_{use_leace}"
        return self._jit(name, _fn)(
            core_params,
            target_labels,
            source_labels,
            clip_feats,
            jnp.asarray(image_scale, jnp.float32),
            drop_mask if zero_image else jnp.zeros((B,), bool),
            leace_args,
        )

    def _sample_impl(
        self,
        core_params,
        cond,
        cond_uncond,  # dummy zeros when do_cfg is False
        key,
        eta_key,
        steer_scale,
        guidance_scale,
        *,
        image_size: int,
        steps: int,
        eta: float,
        shared_noise: bool,
        do_cfg: bool,
        encoder_stride: int = 1,
        cache_mode: str = "encoder",
        sampler: str = "ddim",
    ) -> jnp.ndarray:
        B = cond.shape[0]
        lat = image_size // self.spatial_factor
        C = self.core_cfg.unet.in_channels
        if shared_noise:
            single = jax.random.normal(key, (1, lat, lat, C), jnp.float32)
            x0 = jnp.tile(single, (B, 1, 1, 1))
        else:
            x0 = jax.random.normal(key, (B, lat, lat, C), jnp.float32)

        def raw_eps(x, t, i, embeds):
            return self.core.apply(
                core_params, x, t, embeds, steer_scale, method=self.core.eps
            )

        eps_fn = cfg_eps_fn(
            raw_eps, cond, cond_uncond if do_cfg else None, guidance_scale
        )
        encode_fn = decode_fn = None
        if encoder_stride > 1:
            if do_cfg:
                raise ValueError(
                    "feature propagation is not supported with dual-pass CFG"
                )

            if cache_mode == "deep":

                def encode_fn(x, t, i):
                    return self.core.apply(
                        core_params, x, t, cond, steer_scale,
                        method=self.core.eps_deep,
                    )

                def decode_fn(x, t, i, cache):
                    return self.core.apply(
                        core_params, x, t, cond, cache, steer_scale,
                        method=self.core.eps_shallow,
                    )
            else:

                def encode_fn(x, t, i):
                    return self.core.apply(
                        core_params, x, t, cond, steer_scale,
                        method=self.core.eps_encode,
                    )

                def decode_fn(t, i, cache):
                    return self.core.apply(
                        core_params, t, cond, cache, steer_scale,
                        method=self.core.eps_decode,
                    )

        # "dpm" = DPM-Solver++(2M), beyond-reference (deterministic; eta
        # ignored) — the 20-25-step serving operating point. "ddim" is the
        # reference-exact default.
        sample_fn = {"ddim": ddim_sample, "dpm": dpm_sample}[sampler]
        return sample_fn(
            eps_fn,
            x0,
            self.schedule,
            SamplerConfig(sampling_steps=steps, eta=eta,
                          encoder_stride=encoder_stride,
                          cache_mode=cache_mode),
            key=eta_key if eta > 0 else None,
            encode_fn=encode_fn,
            decode_fn=decode_fn,
        )

    def _get_jitted_sample(self, **static):
        """Cache one compiled sampler per static-knob combination.

        Params/conditioning enter as jit ARGUMENTS — closing over the 859M-
        param tree would embed it as HLO constants and blow up compile time.
        """
        from ..core.mode import is_training

        key = tuple(sorted(static.items())) + (is_training(),)
        cache = getattr(self, "_sample_cache", None)
        if cache is None:
            cache = {}
            self._sample_cache = cache
        if key not in cache:
            from functools import partial

            impl_kwargs = {k: v for k, v in static.items() if k != "dp_sharded"}
            cache[key] = jax.jit(partial(self._sample_impl, **impl_kwargs))
        return cache[key]

    def generate(
        self,
        core_params,
        vae_params,
        cond: jnp.ndarray,
        key: jax.Array,
        image_size: int = 256,
        sampling_steps: Optional[int] = None,
        eta: float = 0.0,
        steer_scale: float | jnp.ndarray = 0.0,
        guidance_scale: float | jnp.ndarray = 1.0,
        cond_uncond: Optional[jnp.ndarray] = None,
        shared_noise: bool = True,
        eta_key: Optional[jax.Array] = None,
        encoder_stride: int = 1,
        cache_mode: str = "encoder",
        sampler: str = "ddim",
    ) -> jnp.ndarray:
        """sample + VAE decode as ONE jitted program → images in [0,1].

        One dispatch instead of two: the serving/bench path never syncs
        between the DDIM scan and the decoder (the reference decodes in a
        separate call, inference_pipeline_ip.py:473-486)."""
        steps = sampling_steps or self.cfg.diffusion.sampling_steps
        do_cfg = cond_uncond is not None
        jfn = self._get_jitted_generate(
            image_size=image_size, steps=steps, eta=eta,
            shared_noise=shared_noise, do_cfg=do_cfg,
            encoder_stride=encoder_stride, cache_mode=cache_mode,
            sampler=sampler)
        uncond_arg = cond_uncond if do_cfg else jnp.zeros_like(cond)
        return jfn(
            core_params, vae_params, cond, uncond_arg, key,
            # never reuse the init-noise key for the eta-noise stream
            eta_key if eta_key is not None else jax.random.fold_in(key, 1),
            jnp.asarray(steer_scale, jnp.float32),
            jnp.asarray(guidance_scale, jnp.float32),
        )

    def _get_jitted_generate(self, **static):
        from ..core.mode import is_training

        # canonicalize defaulted statics so generate() and generate_cost()
        # resolve to the SAME cached jit (and thus the same compiled program)
        for k, v in (("eta", 0.0), ("shared_noise", True), ("do_cfg", False),
                     ("encoder_stride", 1), ("cache_mode", "encoder"),
                     ("sampler", "ddim")):
            static.setdefault(k, v)
        cache_key = ("generate",) + tuple(sorted(static.items())) + (is_training(),)
        cache = getattr(self, "_sample_cache", None)
        if cache is None:
            cache = {}
            self._sample_cache = cache
        if cache_key not in cache:
            def _gen(cp, vp, cond, uncond, k1, k2, steer, guid):
                lat = self._sample_impl(cp, cond, uncond, k1, k2, steer,
                                        guid, **static)
                imgs = self.vae.apply(vp, lat / self.latent_scale,
                                      method=self.vae.decode)
                return jnp.clip(imgs.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

            cache[cache_key] = jax.jit(_gen)
        return cache[cache_key]

    def generate_cost(
        self,
        core_params,
        vae_params,
        cond: jnp.ndarray,
        key: jax.Array,
        image_size: int = 256,
        sampling_steps: Optional[int] = None,
        **static_kw,
    ) -> Dict[str, float]:
        """XLA cost_analysis of the EXACT compiled generate program.

        Returns {"flops", "bytes", ...} for one batch: the machine-checked
        basis for bench.py's ceiling/MFU fields — the same jitted function
        `generate` dispatches, lowered AOT, so the numbers can never drift
        from the benchmarked program.

        XLA's cost_analysis counts a `lax.scan` body ONCE regardless of
        trip count, so the full-program number alone under-reports the
        sampler by ~steps×. The total is therefore composed as
        full_program + (steps-1) × one-eps-step, where the step program is
        the same `core.eps` the scan body calls, lowered standalone at the
        identical shapes (the remaining scan-body pointwise DDIM update is
        counted once in the full program and is <0.1% of a step)."""
        steps = sampling_steps or self.cfg.diffusion.sampling_steps
        jfn = self._get_jitted_generate(
            image_size=image_size, steps=steps,
            eta=static_kw.pop("eta", 0.0),
            shared_noise=static_kw.pop("shared_noise", True),
            do_cfg=False, **static_kw)
        lowered = jfn.lower(
            core_params, vae_params, cond, jnp.zeros_like(cond), key,
            jax.random.fold_in(key, 1), jnp.float32(1.0), jnp.float32(1.0))

        def _cost(lw):
            c = lw.compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return (float(c.get("flops", 0.0)),
                    float(c.get("bytes accessed", 0.0)))

        full_flops, full_bytes = _cost(lowered)

        B = cond.shape[0]
        lat = image_size // 8

        def _eps(p, x, t, c):
            return self.core.apply(p, x, t, c, 0.0, method=self.core.eps)

        step_lowered = jax.jit(_eps).lower(
            core_params, jnp.zeros((B, lat, lat, 4), jnp.float32),
            jnp.zeros((B,), jnp.int32), cond)
        step_flops, step_bytes = _cost(step_lowered)

        # MXU-tile-PADDED flops of the same programs (utils/padded_cost):
        # the algorithmic numbers above bound throughput optimistically —
        # head_dim-40 attention pads 3.2× on the 128-lane MXU — so the
        # BINDING ceiling bench.py asserts against is the padded one.
        # Same scan composition: jaxpr scan bodies count once, so
        # padded_total = padded_full + (steps-1) × padded_eps_step.
        from ..utils.padded_cost import padded_flops_jaxpr

        x_args = (core_params, vae_params, cond, jnp.zeros_like(cond), key,
                  jax.random.fold_in(key, 1), jnp.float32(1.0),
                  jnp.float32(1.0))
        padded_full = padded_flops_jaxpr(jax.make_jaxpr(jfn)(*x_args).jaxpr)
        padded_step = padded_flops_jaxpr(
            jax.make_jaxpr(_eps)(
                core_params, jnp.zeros((B, lat, lat, 4), jnp.float32),
                jnp.zeros((B,), jnp.int32), cond).jaxpr)
        return {"flops": full_flops + (steps - 1) * step_flops,
                "bytes": full_bytes + (steps - 1) * step_bytes,
                "full_program_flops": full_flops,
                "eps_step_flops": step_flops,
                "padded_flops": padded_full + (steps - 1) * padded_step,
                "padded_full_program_flops": padded_full,
                "padded_eps_step_flops": padded_step,
                "steps": steps}

    def sample(
        self,
        core_params,
        cond: jnp.ndarray,
        key: jax.Array,
        image_size: int = 256,
        sampling_steps: Optional[int] = None,
        eta: float = 0.0,
        steer_scale: float | jnp.ndarray = 0.0,
        guidance_scale: float | jnp.ndarray = 1.0,
        cond_uncond: Optional[jnp.ndarray] = None,
        shared_noise: bool = True,
        eta_key: Optional[jax.Array] = None,
        mesh=None,
        encoder_stride: int = 1,
        cache_mode: str = "encoder",
        sampler: str = "ddim",
    ) -> jnp.ndarray:
        """DDIM sampling; returns scaled latents (B, h, w, 4).

        shared_noise=True replicates one initial latent across the batch —
        the reference's 'same noise for all MES levels' behavior
        (inference_pipeline_ip.py:376-385). The whole sampler is ONE jitted
        program (scan over steps); steer/guidance scales are traced.

        With a `mesh`, the batch shards over the dp axis (params replicated)
        so serving throughput scales across chips via ICI — the multi-chip
        counterpart the reference lacks (SURVEY.md §2.2).
        """
        steps = sampling_steps or self.cfg.diffusion.sampling_steps
        do_cfg = cond_uncond is not None
        fn = self._get_jitted_sample(
            image_size=image_size,
            steps=steps,
            eta=eta,
            shared_noise=shared_noise,
            do_cfg=do_cfg,
            encoder_stride=encoder_stride,
            cache_mode=cache_mode,
            sampler=sampler,
            dp_sharded=mesh is not None,
        )
        uncond_arg = cond_uncond if do_cfg else jnp.zeros_like(cond)
        scope = None
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, batch_sharding_scope
            from jax.sharding import NamedSharding, PartitionSpec as P

            bsh = batch_sharding(mesh)
            spec3 = NamedSharding(mesh, P(bsh.spec[0], None, None))
            cond = jax.device_put(cond, spec3)
            uncond_arg = jax.device_put(uncond_arg, spec3)
            core_params = jax.device_put(
                core_params, NamedSharding(mesh, P())
            )
            scope = batch_sharding_scope(mesh)
        import contextlib

        with scope or contextlib.nullcontext():
            return fn(
                core_params,
                cond,
                uncond_arg,
                key,
                eta_key if eta_key is not None else jax.random.fold_in(key, 1),
                jnp.asarray(steer_scale, jnp.float32),
                jnp.asarray(guidance_scale, jnp.float32),
            )
