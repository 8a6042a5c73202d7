"""HAT tests: checkpoint-layout loading (100% key consumption), config
derivation, and NUMERIC PARITY against the reference torch implementation
(external oracle when present — never shipped)."""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import hat

TINY = hat.HATConfig(embed_dim=12, depths=(2, 2), heads=(2, 2), window=4,
                     compress_ratio=3, squeeze_factor=4, num_feat=8,
                     overlap_ratio=0.5, scale=4)


def _shim_basicsr(torch):
    """hat_arch imports two helpers from basicsr; provide them."""
    if "basicsr" in sys.modules:
        return
    import collections.abc
    import itertools

    def to_2tuple(x):
        if isinstance(x, collections.abc.Iterable):
            return tuple(x)
        return tuple(itertools.repeat(x, 2))

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    class _Registry:
        def register(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    basicsr = types.ModuleType("basicsr")
    utils = types.ModuleType("basicsr.utils")
    registry = types.ModuleType("basicsr.utils.registry")
    registry.ARCH_REGISTRY = _Registry()
    archs = types.ModuleType("basicsr.archs")
    arch_util = types.ModuleType("basicsr.archs.arch_util")
    arch_util.to_2tuple = to_2tuple
    arch_util.trunc_normal_ = trunc_normal_
    for name, mod in (("basicsr", basicsr), ("basicsr.utils", utils),
                      ("basicsr.utils.registry", registry),
                      ("basicsr.archs", archs),
                      ("basicsr.archs.arch_util", arch_util)):
        sys.modules[name] = mod


def torch_hat(cfg: hat.HATConfig, seed=0, img_size=16):
    torch = pytest.importorskip("torch")
    ref = "/root/reference/gyre/pipeline/upscalers/models"
    if not os.path.isdir(ref):
        pytest.skip("reference torch HAT not available")
    _shim_basicsr(torch)
    sys.path.insert(0, ref)
    try:
        import hat_arch
    finally:
        sys.path.remove(ref)
    torch.manual_seed(seed)
    net = hat_arch.HAT(
        img_size=img_size, in_chans=cfg.in_ch, embed_dim=cfg.embed_dim,
        depths=list(cfg.depths), num_heads=list(cfg.heads),
        window_size=cfg.window, compress_ratio=cfg.compress_ratio,
        squeeze_factor=cfg.squeeze_factor, conv_scale=cfg.conv_scale,
        overlap_ratio=cfg.overlap_ratio, mlp_ratio=cfg.mlp_ratio,
        upsampler="pixelshuffle", resi_connection="1conv",
        upscale=cfg.scale, img_range=cfg.img_range)
    net.eval()
    return net


def test_load_real_layout_and_parity():
    torch = pytest.importorskip("torch")
    net = torch_hat(TINY)
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}

    params, derived = hat.load_hat(state)   # strict
    assert derived.embed_dim == TINY.embed_dim
    assert derived.depths == TINY.depths and derived.heads == TINY.heads
    assert derived.window == TINY.window
    assert derived.compress_ratio == TINY.compress_ratio
    assert derived.squeeze_factor == TINY.squeeze_factor
    assert derived.overlap_ratio == TINY.overlap_ratio
    assert derived.scale == TINY.scale
    assert derived.num_feat == 64  # the published arch hardcodes num_feat

    x = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32)
    ours = np.asarray(hat.apply(params, jnp.asarray(x), derived))
    with torch.no_grad():
        theirs = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    theirs = theirs.numpy().transpose(0, 2, 3, 1).clip(0, 1)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_rpi_oca_matches_reference():
    net = torch_hat(TINY)
    ref_idx = net.relative_position_index_OCA.numpy()
    table = (TINY.window + TINY.overlap_win - 1) ** 2
    ours = hat._rpi_oca(TINY.window, TINY.overlap_win)
    np.testing.assert_array_equal(ours, ref_idx % table)


def test_strict_load_catches_unconsumed():
    net = torch_hat(TINY)
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    state["layers.0.zzz.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(KeyError, match="unconsumed"):
        hat.load_hat(state)


def test_random_init_forward():
    p = hat.init(jax.random.PRNGKey(0), TINY)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 24, 3))
    out = hat.apply(p, x, TINY)
    assert out.shape == (1, 64, 96, 3)
    assert np.isfinite(np.asarray(out)).all()
    # non-multiple-of-window input pads and crops
    x2 = jax.random.uniform(jax.random.PRNGKey(2), (1, 15, 13, 3))
    assert hat.apply(p, x2, TINY).shape == (1, 60, 52, 3)


def test_full_size_presets():
    assert hat.HAT_M.embed_dim == 180 and hat.HAT_M.window == 16
    assert len(hat.HAT_L.depths) == 12
