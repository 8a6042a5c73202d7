"""Fused GN+SiLU->conv3x3 Pallas kernel vs the unfused XLA chain
(runs in Pallas interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.ops import fused_norm_conv as F


@pytest.mark.parametrize("shape,co,th", [
    ((2, 16, 16, 128), 128, 4),
    ((1, 8, 8, 256), 128, 8),     # single-tile path
    ((1, 4, 12, 128), 256, 2),    # non-square, channel growth
])
def test_fused_matches_reference(shape, co, th):
    rng = np.random.default_rng(1)
    b, h, w, c = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    sc = jnp.asarray(1 + 0.1 * rng.standard_normal((c,)), jnp.float32)
    bi = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)
    wt = jnp.asarray(0.05 * rng.standard_normal((3, 3, c, co)),
                     jnp.float32)
    cb = jnp.asarray(0.1 * rng.standard_normal((co,)), jnp.float32)
    ref = np.asarray(F.gn_silu_conv3x3_reference(x, sc, bi, wt, cb))
    out = np.asarray(F.gn_silu_conv3x3(x, sc, bi, wt, cb, th=th))
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-8)
    assert err < 1e-4, err


def test_fusable_gate():
    assert F.fusable((1, 64, 64, 128), (3, 3, 128, 128))
    assert not F.fusable((1, 64, 64, 120), (3, 3, 120, 128))  # lanes
    assert not F.fusable((1, 64, 64, 128), (1, 1, 128, 128))  # not 3x3
    assert not F.fusable((1, 512, 4096, 512), (3, 3, 512, 512))  # VMEM


def test_fused_is_differentiable():
    """CLIP guidance differentiates the UNet; the fused op's custom VJP
    must match the reference chain's gradients."""
    import jax

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128)), jnp.float32)
    sc = jnp.ones((128,), jnp.float32)
    bi = jnp.zeros((128,), jnp.float32)
    w = jnp.asarray(0.05 * rng.standard_normal((3, 3, 128, 128)),
                    jnp.float32)
    cb = jnp.zeros((128,), jnp.float32)

    def loss_fused(x):
        return jnp.sum(F.gn_silu_conv3x3(x, sc, bi, w, cb) ** 2)

    def loss_ref(x):
        return jnp.sum(F.gn_silu_conv3x3_reference(x, sc, bi, w, cb) ** 2)

    gf = np.asarray(jax.grad(loss_fused)(x))
    gr = np.asarray(jax.grad(loss_ref)(x))
    err = np.abs(gf - gr).max() / (np.abs(gr).max() + 1e-8)
    assert err < 1e-4, err


def test_vae_decode_fused_matches_unfused():
    """Integration: VAE decoder output identical with fusion forced on
    (interpret mode) vs off, at a lane-aligned channel width."""
    import dataclasses

    import jax

    from gyre_tpu.models import configs, vae
    from gyre_tpu.ops import fusion

    cfg = dataclasses.replace(configs.VAE_TEST,
                              block_out_channels=(128, 128))
    params = vae.init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4))
    try:
        fusion.override(False)
        ref = np.asarray(vae.decode(params, cfg, z))
        fusion.override(True)
        out = np.asarray(vae.decode(params, cfg, z))
    finally:
        fusion.override(None)
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-8)
    assert err < 1e-4, err
