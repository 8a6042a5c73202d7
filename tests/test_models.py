"""Shape/sanity tests for the core model implementations (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import clip, configs, unet, vae


def test_unet_shapes(rng_key):
    cfg = configs.UNET_TEST
    params = unet.init(rng_key, cfg)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([10.0, 10.0])
    ctx = jnp.zeros((2, 77, cfg.cross_attention_dim))
    out = jax.jit(lambda p, x, t, c: unet.apply(p, cfg, x, t, c))(params, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_batch_rows_independent(rng_key):
    """Row i of the output depends only on row i of the inputs."""
    cfg = configs.UNET_TEST
    params = unet.init(rng_key, cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(k1, (2, 16, 16, 4))
    ctx = jax.random.normal(k2, (2, 77, cfg.cross_attention_dim))
    t = jnp.array([5.0, 9.0])
    full = unet.apply(params, cfg, x, t, ctx)
    solo = unet.apply(params, cfg, x[:1], t[:1], ctx[:1])
    np.testing.assert_allclose(np.asarray(full[0]), np.asarray(solo[0]),
                               rtol=2e-5, atol=2e-5)


def test_unet_sdxl_style_conditioning(rng_key):
    cfg = configs.UNetConfig(
        block_out_channels=(32, 64),
        attn_levels=(False, True),
        transformer_layers=(0, 2),
        num_heads=(4, 4),
        cross_attention_dim=64,
        time_embed_dim=128,
        norm_groups=8,
        mid_transformer_layers=2,
        linear_projection=True,
        addition_embed_dim=32,
        addition_time_dim=16,
        addition_time_ids=6,
    )
    params = unet.init(rng_key, cfg)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 77, 64))
    added = {"text_embeds": jnp.zeros((1, 32)),
             "time_ids": jnp.zeros((1, 6))}
    out = unet.apply(params, cfg, x, jnp.array([1.0]), ctx, added_cond=added)
    assert out.shape == (1, 16, 16, 4)


def test_unet_controlnet_residual_hookup(rng_key):
    cfg = configs.UNET_TEST
    params = unet.init(rng_key, cfg)
    x = jnp.ones((1, 16, 16, 4)) * 0.1
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    t = jnp.array([1.0])
    base = unet.apply(params, cfg, x, t, ctx)
    # zero residuals must be a no-op
    n_skips = 1 + cfg.levels * cfg.layers_per_block + (cfg.levels - 1)
    chans = [cfg.block_out_channels[0]]
    h = 16
    sizes = [(h, chans[0])]
    for lvl, c in enumerate(cfg.block_out_channels):
        for _ in range(cfg.layers_per_block):
            sizes.append((h, c))
        if lvl < cfg.levels - 1:
            h //= 2
            sizes.append((h, c))
    assert len(sizes) == n_skips
    zeros = [jnp.zeros((1, s, s, c)) for s, c in sizes]
    mid = jnp.zeros((1, h, h, cfg.block_out_channels[-1]))
    out = unet.apply(params, cfg, x, t, ctx, down_residuals=zeros,
                     mid_residual=mid)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out), atol=1e-6)


def test_vae_roundtrip_shapes(rng_key):
    cfg = configs.VAE_TEST
    params = vae.init(rng_key, cfg)
    x = jax.random.normal(rng_key, (1, 32, 32, 3)) * 0.1
    mean, logvar = vae.encode(params, cfg, x)
    assert mean.shape == (1, 4, 4, 4)
    z = vae.sample_posterior(mean, logvar, jnp.zeros_like(mean))
    y = vae.decode(params, cfg, z)
    assert y.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_clip_shapes_and_layers(rng_key):
    cfg = configs.CLIP_TEST
    params = clip.init(rng_key, cfg)
    ids = jnp.array([[49406, 320, 1125, 49407] + [0] * 73])
    out = clip.apply(params, cfg, ids)
    assert out["last"].shape == (1, 77, cfg.hidden_size)
    assert out["pooled"].shape == (1, cfg.hidden_size)
    assert len(out["hidden_states"]) == cfg.num_layers
    pen = clip.hidden_for_layer(params, cfg, out, -2)
    assert pen.shape == (1, 77, cfg.hidden_size)
    # penultimate != final
    assert not np.allclose(np.asarray(pen), np.asarray(out["last"]))


def test_clip_causal(rng_key):
    """Changing a later token must not affect earlier positions."""
    cfg = configs.CLIP_TEST
    params = clip.init(rng_key, cfg)
    a = jnp.array([[49406, 100, 200, 49407, 0, 0, 0, 0]])
    b = jnp.array([[49406, 100, 999, 49407, 0, 0, 0, 0]])
    oa = clip.apply(params, cfg, a)["hidden_states"][-1]
    ob = clip.apply(params, cfg, b)["hidden_states"][-1]
    np.testing.assert_allclose(np.asarray(oa[0, :2]), np.asarray(ob[0, :2]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(oa[0, 2]), np.asarray(ob[0, 2]))
