"""DeepCache-style branch-caching tests (arXiv:2310.01407) + ToMe wiring.

The turbo serving path composes three approximations, each individually
gated here:
  * UNet phase="deep"/"shallow" split — shallow with a FRESH cache must
    reproduce the full forward (same math, different program partition).
  * sampler cache_mode="deep" — key steps exact, non-key steps run the
    shallow path on the CURRENT x_t.
  * ToMe token merging — tome_ratio=0 is byte-identical to the exact path
    (the module is never imported); ratio>0 stays in the same regime.
"""

import jax
import jax.numpy as jnp
import numpy as np

from psd_tpu.models.unet import UNet2DCondition, tiny_unet_config
from psd_tpu.testing import tiny_dadd
from psd_tpu.utils.fast_init import fast_init


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def _unet_setup(attn_mode="split3"):
    cfg = tiny_unet_config(attn_mode=attn_mode)
    unet = UNet2DCondition(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4), jnp.float32)
    t = jnp.array([10, 700], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 32), jnp.float32)
    params = fast_init(unet, {"params": jax.random.PRNGKey(2)}, x[:1], t[:1],
                       ctx[:1], 0.0)
    return unet, params, x, t, ctx


def test_shallow_with_fresh_cache_equals_full():
    unet, params, x, t, ctx = _unet_setup()
    full = unet.apply(params, x, t, ctx, 0.5)
    eps_d, deep = unet.apply(params, x, t, ctx, 0.5, phase="deep")
    sh = unet.apply(params, x, t, ctx, 0.5, phase="shallow", cached=deep)
    # 'deep' is the same graph as 'full' with one extra output; program-
    # boundary fusion may reorder fp32 accumulation slightly
    assert _rel(eps_d, full) < 2e-4
    np.testing.assert_allclose(np.asarray(sh), np.asarray(full),
                               rtol=1e-5, atol=2e-5)


def test_shallow_sees_current_x():
    """Unlike phase='decode', the shallow path must react to x (that is
    the point of DeepCache — x_t tracking on every step)."""
    unet, params, x, t, ctx = _unet_setup(attn_mode="plain")
    _, deep = unet.apply(params, x, t, ctx, 0.0, phase="deep")
    s1 = unet.apply(params, x, t, ctx, 0.0, phase="shallow", cached=deep)
    s2 = unet.apply(params, x + 1.0, t, ctx, 0.0, phase="shallow", cached=deep)
    assert _rel(s1, s2) > 1e-3


def test_deep_single_key_step_matches_baseline():
    model = tiny_dadd()
    params = model.init_core(jax.random.PRNGKey(0), 32)
    targets = jnp.array([0.0, 3.0])
    cond = model.prepare_inference_cond(params, targets, jnp.zeros((2,)), None)
    base = model.sample(params, cond, jax.random.PRNGKey(5), image_size=32,
                        sampling_steps=1, steer_scale=1.0)
    prop = model.sample(params, cond, jax.random.PRNGKey(5), image_size=32,
                        sampling_steps=1, steer_scale=1.0, encoder_stride=2,
                        cache_mode="deep")
    np.testing.assert_allclose(np.asarray(prop), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_deep_strided_sampling_runs_and_tracks_baseline():
    model = tiny_dadd()
    params = model.init_core(jax.random.PRNGKey(0), 32)
    targets = jnp.array([0.0, 3.0])
    cond = model.prepare_inference_cond(params, targets, jnp.zeros((2,)), None)
    base = model.sample(params, cond, jax.random.PRNGKey(5), image_size=32,
                        sampling_steps=4, steer_scale=1.0)
    prop = model.sample(params, cond, jax.random.PRNGKey(5), image_size=32,
                        sampling_steps=4, steer_scale=1.0, encoder_stride=2,
                        cache_mode="deep")
    assert prop.shape == base.shape
    assert np.isfinite(np.asarray(prop)).all()
    assert 0.0 < _rel(prop, base) < 1.0


def test_tome_unet_close_but_not_identical():
    cfg0 = tiny_unet_config()
    cfgT = tiny_unet_config(tome_ratio=0.5, tome_min_tokens=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32), jnp.float32)
    u0, uT = UNet2DCondition(cfg0), UNet2DCondition(cfgT)
    params = fast_init(u0, {"params": jax.random.PRNGKey(2)}, x, t, ctx)
    o0 = u0.apply(params, x, t, ctx)
    oT = uT.apply(params, x, t, ctx)
    r = _rel(oT, o0)
    assert 0.0 < r < 0.2, r


def test_tome_ratio_zero_is_inert():
    """ratio=0 must leave the traced program identical (tome=None path)."""
    cfg0 = tiny_unet_config()
    cfgZ = tiny_unet_config(tome_ratio=0.0, tome_min_tokens=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4), jnp.float32)
    t = jnp.array([3], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32), jnp.float32)
    u0, uZ = UNet2DCondition(cfg0), UNet2DCondition(cfgZ)
    params = fast_init(u0, {"params": jax.random.PRNGKey(2)}, x, t, ctx)
    j0 = jax.make_jaxpr(lambda p, x, t, c: u0.apply(p, x, t, c))(params, x, t, ctx)
    jz = jax.make_jaxpr(lambda p, x, t, c: uZ.apply(p, x, t, c))(params, x, t, ctx)
    assert str(j0) == str(jz)


def test_tome_deepcache_compose_in_sampler():
    """The full turbo composition (ToMe × deep cache) samples end to end."""
    from psd_tpu.testing import tiny_dadd

    model = tiny_dadd(tome_ratio=0.5, tome_min_tokens=64)
    params = model.init_core(jax.random.PRNGKey(0), 32)
    targets = jnp.array([0.0, 3.0])
    cond = model.prepare_inference_cond(params, targets, jnp.zeros((2,)), None)
    out = model.sample(params, cond, jax.random.PRNGKey(5), image_size=32,
                       sampling_steps=4, steer_scale=1.0, encoder_stride=2,
                       cache_mode="deep")
    assert np.isfinite(np.asarray(out)).all()


def test_tome_block_mode_close_and_cheaper():
    """Block-resident ToMe: same quality class as branch mode, and the
    traced program carries exactly ONE merge gather per block (the branch
    mode carries one per wrapped branch)."""
    cfg0 = tiny_unet_config()
    cfgB = tiny_unet_config(tome_ratio=0.5, tome_min_tokens=64,
                            tome_mode="block")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32), jnp.float32)
    u0, uB = UNet2DCondition(cfg0), UNet2DCondition(cfgB)
    params = fast_init(u0, {"params": jax.random.PRNGKey(2)}, x, t, ctx)
    o0 = u0.apply(params, x, t, ctx)
    oB = uB.apply(params, x, t, ctx)
    assert oB.shape == o0.shape
    r = _rel(oB, o0)
    assert 0.0 < r < 0.25, r


def test_tome_block_mode_duplicate_regions_attention_exactness():
    """On an input whose 2x2 regions are constant, block-mode merge is
    lossless at the token level: every kept token equals its region's
    merged mean, so the block output's unmerge reproduces a per-region-
    constant tensor (the block preserves region constancy)."""
    from psd_tpu.models.layers import BasicTransformerBlock
    from psd_tpu.ops.tome import ToMeSpec

    B, H, W, C = 1, 8, 8, 16
    base = jax.random.normal(jax.random.PRNGKey(3), (B, H // 2, W // 2, C))
    x = jnp.repeat(jnp.repeat(base, 2, axis=1), 2, axis=2).reshape(B, H * W, C)
    ctx = jax.random.normal(jax.random.PRNGKey(4), (B, 8, C), jnp.float32)
    blk = BasicTransformerBlock(
        2, tome=ToMeSpec(ratio=0.75, min_tokens=16, mode="block"),
        hw=(H, W), dtype=jnp.float32,
    )
    params = blk.init(jax.random.PRNGKey(5), x, ctx)
    y = np.asarray(blk.apply(params, x, ctx)).reshape(B, H // 2, 2, W // 2, 2, C)
    np.testing.assert_allclose(y[:, :, 0, :, 0], y[:, :, 1, :, 1], rtol=1e-5)
    np.testing.assert_allclose(y[:, :, 0, :, 0], y[:, :, 0, :, 1], rtol=1e-5)


# ---- structural probes (VERDICT r3 item 6): the speedup's existence, not
# just its outputs. A regression that silently ran the full graph on
# non-key steps would pass every output-level test above while erasing the
# lever's value; these pin WHICH blocks each phase/branch executes. --------


def _intermediate_keys(unet, params, args, **apply_kw):
    _, var = unet.apply(params, *args, capture_intermediates=True,
                        mutable=["intermediates"], **apply_kw)
    flat = jax.tree_util.tree_flatten_with_path(var["intermediates"])[0]
    keys = set()
    for path, _ in flat:
        for p in path:
            keys.add(getattr(p, "key", getattr(p, "name", str(p))))
    return keys


def test_shallow_phase_executes_only_shallow_blocks():
    """phase='shallow' runs conv_in → down block 0 → LAST up block; the
    deep blocks (down 1+, mid, up 0..n-2) must be absent from the traced
    module set."""
    unet, params, x, t, ctx = _unet_setup()
    _, deep = unet.apply(params, x, t, ctx, 0.5, phase="deep")
    keys = _intermediate_keys(unet, params, (x, t, ctx, 0.5),
                              phase="shallow", cached=deep)
    assert any(k.startswith("down_blocks_0_") for k in keys)
    assert any(k.startswith("up_blocks_1_") for k in keys)
    deep_blocks = [k for k in keys
                   if k.startswith(("down_blocks_1", "mid_block", "up_blocks_0"))]
    assert not deep_blocks, f"shallow phase entered deep blocks: {deep_blocks}"
    assert not any(k.startswith("down_blocks_0_downsamplers") for k in keys)


def test_decode_phase_executes_only_decoder_blocks():
    """phase='decode' (encoder propagation) never re-enters conv_in/down/mid."""
    unet, params, x, t, ctx = _unet_setup()
    cached = unet.apply(params, x, t, ctx, 0.5, phase="encode")
    keys = _intermediate_keys(unet, params, (x, t, ctx, 0.5),
                              phase="decode", cached=cached)
    assert any(k.startswith("up_blocks_0_") for k in keys)
    assert any(k.startswith("up_blocks_1_") for k in keys)
    enc_blocks = [k for k in keys
                  if k.startswith(("down_blocks", "mid_block", "conv_in"))]
    assert not enc_blocks, f"decode phase entered encoder blocks: {enc_blocks}"


def _iter_subjaxprs(p):
    # duck-typed: ClosedJaxpr has .jaxpr, Jaxpr has .eqns (jax.core paths
    # for these classes are deprecated/moved across jax versions)
    if hasattr(p, "jaxpr"):
        yield p.jaxpr
    elif hasattr(p, "eqns"):
        yield p
    elif isinstance(p, (tuple, list)):
        for q in p:
            yield from _iter_subjaxprs(q)


def _count_prim(jaxpr, name):
    n = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == name:
            n += 1
        for param in eqn.params.values():
            for sub in _iter_subjaxprs(param):
                n += _count_prim(sub, name)
    return n


def _find_eqns(jaxpr, name, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == name:
            out.append(eqn)
        for param in eqn.params.values():
            for sub in _iter_subjaxprs(param):
                _find_eqns(sub, name, out)
    return out


def test_deepcache_scan_nonkey_branch_has_no_deep_convs():
    """In the compiled deep-cache sampler, the lax.cond inside the scan must
    carry the FULL conv count in one branch and the SHALLOW count in the
    other — matching the standalone phase traces exactly. If a regression
    made the 'shallow' branch run the whole graph, the branch conv counts
    would equalize and this fails."""
    model = tiny_dadd()
    params = model.init_core(jax.random.PRNGKey(0), 32)
    n_tok = 3 * model.core_cfg.num_aoe_tokens
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, n_tok, 32))

    from functools import partial

    impl = partial(model._sample_impl, image_size=32, steps=10, eta=0.0,
                   shared_noise=False, do_cfg=False, encoder_stride=5,
                   cache_mode="deep", sampler="ddim")
    jx = jax.make_jaxpr(impl)(
        params, cond, jnp.zeros_like(cond), jax.random.PRNGKey(2),
        jax.random.PRNGKey(3), jnp.float32(1.0), jnp.float32(1.0))

    # reference conv counts from the standalone phase traces
    x = jnp.zeros((2, 4, 4, 4))
    t = jnp.zeros((2,), jnp.int32)
    full_tr = jax.make_jaxpr(
        lambda p, x, t, c: model.core.apply(p, x, t, c, 1.0,
                                            method=model.core.eps_deep)
    )(params, x, t, cond)
    _, deep_shape = jax.eval_shape(
        lambda p, x, t, c: model.core.apply(p, x, t, c, 1.0,
                                            method=model.core.eps_deep),
        params, x, t, cond)
    cache = jnp.zeros(deep_shape.shape, deep_shape.dtype)
    shallow_tr = jax.make_jaxpr(
        lambda p, x, t, c, h: model.core.apply(p, x, t, c, h, 1.0,
                                               method=model.core.eps_shallow)
    )(params, x, t, cond, cache)
    n_full = _count_prim(full_tr.jaxpr, "conv_general_dilated")
    n_shallow = _count_prim(shallow_tr.jaxpr, "conv_general_dilated")
    assert n_shallow < n_full // 2, (n_shallow, n_full)

    scans = _find_eqns(jx.jaxpr, "scan", [])
    assert scans, "sampler lost its lax.scan"
    conds = []
    for s in scans:
        _find_eqns(s.params["jaxpr"].jaxpr, "cond", conds)
    conv_conds = []
    for c in conds:
        counts = sorted(_count_prim(b.jaxpr, "conv_general_dilated")
                        for b in c.params["branches"])
        if counts[-1] > 0:
            conv_conds.append(counts)
    assert conv_conds, "no conv-bearing cond inside the sampling scan"
    counts = conv_conds[0]
    assert counts == [n_shallow, n_full], (
        f"scan cond branches carry conv counts {counts}, expected shallow="
        f"{n_shallow} / full={n_full}: the non-key branch is not the "
        "shallow subgraph"
    )


def test_encoder_prop_scan_decode_every_step_encode_gated():
    """Encoder propagation: the scan's cond gates the ENCODER only; its
    non-key branch must carry zero convs (cache passthrough)."""
    model = tiny_dadd()
    params = model.init_core(jax.random.PRNGKey(0), 32)
    n_tok = 3 * model.core_cfg.num_aoe_tokens
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, n_tok, 32))
    from functools import partial

    impl = partial(model._sample_impl, image_size=32, steps=10, eta=0.0,
                   shared_noise=False, do_cfg=False, encoder_stride=5,
                   cache_mode="encoder", sampler="ddim")
    jx = jax.make_jaxpr(impl)(
        params, cond, jnp.zeros_like(cond), jax.random.PRNGKey(2),
        jax.random.PRNGKey(3), jnp.float32(1.0), jnp.float32(1.0))
    scans = _find_eqns(jx.jaxpr, "scan", [])
    conds = []
    for s in scans:
        _find_eqns(s.params["jaxpr"].jaxpr, "cond", conds)
    assert conds, "encoder-prop sampler lost its gating cond"
    for c in conds:
        counts = sorted(_count_prim(b.jaxpr, "conv_general_dilated")
                        for b in c.params["branches"])
        assert counts[0] == 0, (
            f"encoder-prop non-key branch runs {counts[0]} convs; it must "
            "be a pure cache passthrough"
        )
