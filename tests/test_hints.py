"""ControlNet / T2I-Adapter conditioning tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import configs, controlnet, t2i_adapter
from gyre_tpu.models.modelset import random_modelset
from gyre_tpu.pipeline.unified import UnifiedPipeline


@pytest.fixture(scope="module")
def pipe():
    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    return UnifiedPipeline(ms, compute_dtype=jnp.float32)


def test_controlnet_shapes(rng_key):
    cfg = configs.UNET_TEST
    params = controlnet.init(rng_key, cfg)
    x = jnp.zeros((1, 8, 8, 4))
    cond = jnp.zeros((1, 64, 64, 3))
    emb = controlnet.embed_condition(params, cond)
    assert emb.shape == (1, 8, 8, cfg.block_out_channels[0])
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    down, mid = controlnet.apply(params, cfg, x, jnp.array([1.0]), ctx, emb)
    n_skips = 1 + cfg.levels * cfg.layers_per_block + (cfg.levels - 1)
    assert len(down) == n_skips
    assert mid.shape[-1] == cfg.block_out_channels[-1]
    # zero-conv init: residuals start at zero
    assert all(float(jnp.abs(d).max()) == 0.0 for d in down)


def test_t2i_adapter_shapes(rng_key):
    params = t2i_adapter.init(rng_key, channels=(32, 64, 128, 128))
    cond = jnp.zeros((1, 64, 64, 3))
    feats = t2i_adapter.apply(params, cond)
    assert [f.shape for f in feats] == [
        (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128), (1, 1, 1, 128)]


def test_controlnet_conditioning_changes_output(pipe, rng_key):
    cn_params = controlnet.init(rng_key, configs.UNET_TEST)
    # zero-convs (incl. the cond-embed output conv) are zero-init by design;
    # randomize them so conditioning flows through random weights
    cn_params["cond_embed"]["conv_out"]["w"] = jax.random.normal(
        rng_key, cn_params["cond_embed"]["conv_out"]["w"].shape) * 0.1
    cn_params["mid_zero"]["w"] = jax.random.normal(
        rng_key, cn_params["mid_zero"]["w"].shape) * 0.1
    cn_params["zero_convs"] = [
        {"w": jax.random.normal(jax.random.fold_in(rng_key, i),
                                zc["w"].shape) * 0.1, "b": zc["b"]}
        for i, zc in enumerate(cn_params["zero_convs"])]

    cond_a = np.zeros((1, 64, 64, 3), np.float32)
    cond_b = np.ones((1, 64, 64, 3), np.float32)
    kw = dict(prompt="a cat", height=64, width=64, steps=2,
              sampler="k_euler", seeds=[3], guidance_scale=7.5)
    base = np.asarray(pipe(**kw))
    a = np.asarray(pipe(hints=[{"params": cn_params, "image": cond_a,
                                "scale": 1.0}], **kw))
    b = np.asarray(pipe(hints=[{"params": cn_params, "image": cond_b,
                                "scale": 1.0}], **kw))
    assert np.abs(a - b).max() > 1e-5
    assert np.abs(a - base).max() > 1e-5
    # scale 0 == no conditioning
    z = np.asarray(pipe(hints=[{"params": cn_params, "image": cond_b,
                                "scale": 0.0}], **kw))
    np.testing.assert_allclose(z, base, atol=1e-5)


def _live_cn(rng_key):
    """Controlnet params with randomized zero-convs so residuals flow."""
    cn_params = controlnet.init(rng_key, configs.UNET_TEST)
    cn_params["cond_embed"]["conv_out"]["w"] = jax.random.normal(
        rng_key, cn_params["cond_embed"]["conv_out"]["w"].shape) * 0.1
    cn_params["mid_zero"]["w"] = jax.random.normal(
        rng_key, cn_params["mid_zero"]["w"].shape) * 0.1
    cn_params["zero_convs"] = [
        {"w": jax.random.normal(jax.random.fold_in(rng_key, i),
                                zc["w"].shape) * 0.1, "b": zc["b"]}
        for i, zc in enumerate(cn_params["zero_convs"])]
    return cn_params


def test_hint_priority_semantics(pipe, rng_key):
    """priority=prompt (soft_injection) applies logspace per-layer
    residual weights; priority=hint additionally confines residuals to
    the guided CFG half — all three must differ from each other
    (reference unified_pipeline.py:996-1058, 2028-2029)."""
    cn_params = _live_cn(rng_key)
    cond = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    kw = dict(prompt="a cat", height=64, width=64, steps=2,
              sampler="k_euler", seeds=[3], guidance_scale=7.5)

    def run(**hint_kw):
        return np.asarray(pipe(hints=[{"params": cn_params, "image": cond,
                                       "scale": 1.0, **hint_kw}], **kw))

    balanced = run()
    soft = run(soft_injection=True)
    cfg_only = run(soft_injection=True, cfg_only=True)
    assert np.abs(balanced - soft).max() > 1e-5
    assert np.abs(soft - cfg_only).max() > 1e-5
    assert np.abs(balanced - cfg_only).max() > 1e-5
    for out in (soft, cfg_only):
        assert np.isfinite(out).all()


def test_hint_mask_zero_equals_no_hint(pipe, rng_key):
    """A zero per-hint mask multiplies every residual level to zero ->
    identical to running without the hint (reference resizes the mask to
    each residual resolution, unified_pipeline.py:1020-1042)."""
    cn_params = _live_cn(rng_key)
    cond = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    kw = dict(prompt="a cat", height=64, width=64, steps=2,
              sampler="k_euler", seeds=[3], guidance_scale=7.5)
    base = np.asarray(pipe(**kw))
    zero_mask = np.zeros((1, 8, 8, 1), np.float32)  # latent-res mask
    masked = np.asarray(pipe(hints=[{
        "params": cn_params, "image": cond, "scale": 1.0,
        "mask": zero_mask}], **kw))
    np.testing.assert_allclose(masked, base, atol=1e-5)
    # ...and a ones mask is a no-op vs the unmasked hint
    unmasked = np.asarray(pipe(hints=[{
        "params": cn_params, "image": cond, "scale": 1.0}], **kw))
    ones = np.asarray(pipe(hints=[{
        "params": cn_params, "image": cond, "scale": 1.0,
        "mask": np.ones((1, 8, 8, 1), np.float32)}], **kw))
    np.testing.assert_allclose(ones, unmasked, atol=1e-5)


def test_t2i_priority_semantics(pipe, rng_key):
    """T2I adapters honour soft_injection (logspace level weights, first
    level dropped to 0.25 under cfg_only) and cfg_only (guided half only)
    — reference unified_pipeline.py:905-917."""
    ad_params = t2i_adapter.init(rng_key, channels=(32, 64, 128, 128))
    cond = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    kw = dict(prompt="a cat", height=64, width=64, steps=2,
              sampler="k_euler", seeds=[3], guidance_scale=7.5)

    def run(**hint_kw):
        return np.asarray(pipe(hints=[{"params": ad_params, "image": cond,
                                       "kind": "t2i", "scale": 1.0,
                                       **hint_kw}], **kw))

    balanced = run()
    soft = run(soft_injection=True)
    cfg_only = run(soft_injection=True, cfg_only=True)
    assert np.abs(balanced - soft).max() > 1e-4
    assert np.abs(soft - cfg_only).max() > 1e-4
    assert np.isfinite(cfg_only).all()


def test_style_adapter_hint(pipe, rng_key):
    """Style hint: CLIP-vision tokens -> style tokens appended to the
    cond context."""
    from gyre_tpu.models import t2i_adapter

    # pipeline's vision tower cfg determines dims
    pipe.clip_vision()
    vcfg = pipe._clip_vision_cfg
    style_params = t2i_adapter.style_init(
        rng_key, context_dim=64, vision_dim=vcfg.hidden_size, n_tokens=4)
    cond = np.random.RandomState(3).rand(1, 64, 64, 3).astype(np.float32)
    kw = dict(prompt="a cat", height=64, width=64, steps=2,
              sampler="k_euler", seeds=[3], guidance_scale=7.5)
    base = np.asarray(pipe(**kw))
    out = np.asarray(pipe(hints=[{"params": style_params, "image": cond,
                                  "kind": "style", "scale": 1.0}], **kw))
    assert out.shape == base.shape
    assert np.abs(out - base).max() > 1e-5


def test_t2i_adapter_ckpt_roundtrip(rng_key):
    params = t2i_adapter.init(rng_key, channels=(32, 64, 128, 128))
    state = t2i_adapter.export_state(params)
    assert "conv_in.weight" in state and "body.0.block1.weight" in state
    back = t2i_adapter.load_params(state)
    cond = jnp.zeros((1, 64, 64, 3))
    a = t2i_adapter.apply(params, cond)
    b = t2i_adapter.apply(back, cond)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_coadapter_fuse():
    from gyre_tpu.models.t2i_adapter import coadapter_fuse

    a = [jnp.ones((1, 4, 4, 8))]
    b = [jnp.full((1, 4, 4, 8), 2.0)]
    out = coadapter_fuse([a, b], weights=[0.5, 0.25])
    np.testing.assert_allclose(np.asarray(out[0]), 1.0)


def test_grafted_generation():
    """graftedpaint: root engine + top engine blended past easing start
    (reference tests/graftedpaint.py scenario at unit scale)."""
    from gyre_tpu.manager.manager import EngineManager

    m = EngineManager(
        [{"id": "root", "model": {"preset": "test", "seed": 0},
          "default": True, "graft": "top"},
         {"id": "top", "model": {"preset": "test", "seed": 9}}],
        compute_dtype=jnp.float32, batch_max=2)
    m.load_engines()
    pipe_graft = m.pipeline("root")
    assert pipe_graft.graft_ms is not None
    kw = dict(prompt="a tree", height=64, width=64, steps=3,
              sampler="k_euler", seeds=[5], guidance_scale=7.5)
    grafted = np.asarray(pipe_graft(**kw))
    solo = np.asarray(m.pipeline("top")(**kw))
    assert np.isfinite(grafted).all()
    assert np.abs(grafted - solo).max() > 1e-4


def test_t2i_hint_in_pipeline(pipe, rng_key):
    ad_params = t2i_adapter.init(rng_key, channels=(32, 64, 128, 128))
    cond = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    kw = dict(prompt="a cat", height=64, width=64, steps=2,
              sampler="k_euler", seeds=[3], guidance_scale=7.5)
    base = np.asarray(pipe(**kw))
    out = np.asarray(pipe(hints=[{"params": ad_params, "image": cond,
                                  "kind": "t2i", "scale": 1.0}], **kw))
    assert np.abs(out - base).max() > 1e-4


def test_hintset_reference_format(tmp_path):
    """Reference hintsets.yaml semantics: '<family>/<type>' keys with
    aliases/priority/'@model-id' refs, engine-bound hintset selection,
    real checkpoint loading through the model registry."""
    from gyre_tpu.manager.manager import EngineManager
    from gyre_tpu.models.load import (export_controlnet_state,
                                      write_safetensors)

    # synthesize a published-layout controlnet checkpoint
    cn = controlnet.init(jax.random.PRNGKey(1), configs.UNET_TEST)
    path = tmp_path / "cn.safetensors"
    write_safetensors(str(path), export_controlnet_state(cn,
                                                         configs.UNET_TEST))

    entries = [
        {"id": "eng", "model": "preset/test", "default": True,
         "hintset": "hs-a"},
        {"model_id": "cn-canny", "model": str(path), "type": "controlnet"},
        {"hintset_id": "hs-a",
         "controlnet11/canny": {"aliases": ["controlnet/canny", "canny"],
                                "priority": 210, "model": "@cn-canny"},
         "t2i/sketch": {"aliases": ["sketch", "scribble"]}},
        {"hintset_id": "hs-b",
         "controlnet10/canny": {"aliases": "canny", "priority": 100}},
    ]
    m = EngineManager(entries, compute_dtype=jnp.float32, batch_max=2)
    m.load_engines()

    assert set(m.model_entries) == {"cn-canny"}
    assert m.hintsets.set_ids() == ["hs-a", "hs-b"]

    # engine 'eng' is bound to hs-a -> the @cn-canny weights load
    hint = m.hint_model("canny", "eng")
    assert hint["kind"] == "controlnet"
    np.testing.assert_allclose(
        np.asarray(hint["params"]["conv_in"]["w"], np.float32),
        np.asarray(cn["conv_in"]["w"], np.float32), atol=1e-6)

    # aliases route; t2i family infers kind
    sk = m.hint_model("scribble", "eng")
    assert sk["kind"] == "t2i"


def test_hintset_priority_and_fallback():
    from gyre_tpu.manager.hints import HintsetManager

    hs = HintsetManager(
        [{"hintset_id": "s",
          "a/depth": {"aliases": "depth", "priority": 5},
          "b/zoedepth": {"aliases": ["depth", "depth/zoe"],
                         "priority": 25}}],
        configs.UNET_TEST, compute_dtype=jnp.float32)
    # highest priority wins for the shared alias
    specs = [sp for sp in hs.specs if sp.matches("depth")]
    specs.sort(key=lambda sp: -sp.priority)
    assert specs[0].name == "b/zoedepth"
    # unknown set falls back across all sets
    out = hs.for_type("depth", hintset="nonexistent")
    assert out["kind"] == "controlnet"
    assert "depth" in hs.types_for("s")


def test_style_adapter_matches_reference_oracle():
    """StyleAdapter numeric parity against the vendored reference torch
    implementation (used as an external oracle when present)."""
    import importlib
    import os
    import sys

    import pytest

    torch = pytest.importorskip("torch")
    ref_dir = "/root/reference/gyre/pipeline/t2i_adapter"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference oracle not available")
    # load as a synthetic package: the real package __init__ imports
    # diffusers, which is absent here
    spec = importlib.machinery.ModuleSpec(
        "t2i_oracle", None, is_package=True)
    spec.submodule_search_locations = [ref_dir]
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["t2i_oracle"] = pkg
    for name in ("utils", "adapter"):
        fspec = importlib.util.spec_from_file_location(
            f"t2i_oracle.{name}", os.path.join(ref_dir, f"{name}.py"))
        m = importlib.util.module_from_spec(fspec)
        sys.modules[f"t2i_oracle.{name}"] = m
        fspec.loader.exec_module(m)
    mod = sys.modules["t2i_oracle.adapter"]

    torch.manual_seed(0)
    net = mod.StyleAdapter(width=32, context_dim=24, num_head=4,
                           n_layes=2, num_token=4).eval()
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = t2i_adapter.load_style_params(state)

    x = np.random.default_rng(0).standard_normal((2, 10, 32)).astype(
        np.float32)
    ours = np.asarray(t2i_adapter.style_apply(params, jnp.asarray(x),
                                              heads=4))
    with torch.no_grad():
        theirs = net(torch.from_numpy(x)).numpy()
    assert ours.shape == theirs.shape
    err = np.abs(ours - theirs).max() / max(np.abs(theirs).max(), 1e-6)
    assert err < 2e-3, err
