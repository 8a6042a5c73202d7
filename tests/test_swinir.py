"""SwinIR tests: checkpoint-layout loading (100% key consumption), config
derivation from shapes, and NUMERIC PARITY against the reference torch
implementation (used as an external oracle when present — never shipped)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import swinir

TINY = swinir.SwinIRConfig(embed_dim=16, depths=(2, 2), heads=(2, 2),
                           window=4, num_feat=8, mlp_ratio=2.0, scale=4,
                           upsampler="nearest+conv", resi="1conv")


def _shim_timm(torch):
    """The oracle imports timm; provide the three tiny helpers it uses."""
    import collections.abc
    import itertools
    import types

    if "timm" in sys.modules:
        return

    def to_2tuple(x):
        if isinstance(x, collections.abc.Iterable):
            return tuple(x)
        return tuple(itertools.repeat(x, 2))

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()

        def forward(self, x):
            return x  # eval mode: identity

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    timm.models = models
    models.layers = layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def torch_swinir(cfg: swinir.SwinIRConfig, seed=0):
    """Instantiate the reference (BasicSR) torch SwinIR as an oracle."""
    torch = pytest.importorskip("torch")
    ref = "/root/reference/gyre/pipeline/upscalers/models"
    if not os.path.isdir(ref):
        pytest.skip("reference torch SwinIR not available")
    _shim_timm(torch)
    sys.path.insert(0, ref)
    try:
        import network_swinir as ns
    finally:
        sys.path.remove(ref)
    torch.manual_seed(seed)
    net = ns.SwinIR(
        img_size=16, in_chans=cfg.in_ch, embed_dim=cfg.embed_dim,
        depths=list(cfg.depths), num_heads=list(cfg.heads),
        window_size=cfg.window, mlp_ratio=cfg.mlp_ratio,
        upsampler=cfg.upsampler, resi_connection=cfg.resi,
        upscale=cfg.scale, img_range=cfg.img_range)
    net.eval()
    return net


def state_numpy(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


@pytest.mark.parametrize("upsampler,resi,scale", [
    ("nearest+conv", "1conv", 4),
    ("pixelshuffle", "1conv", 4),
    ("nearest+conv", "3conv", 2),
])
def test_load_real_layout_and_parity(upsampler, resi, scale):
    import dataclasses

    cfg = dataclasses.replace(TINY, upsampler=upsampler, resi=resi,
                              scale=scale)
    torch = pytest.importorskip("torch")
    net = torch_swinir(cfg)
    state = state_numpy(net)

    params, derived = swinir.load_swinir(state)  # strict: all keys consumed
    assert derived.embed_dim == cfg.embed_dim
    assert derived.depths == cfg.depths and derived.heads == cfg.heads
    assert derived.window == cfg.window
    assert derived.upsampler == upsampler and derived.resi == resi
    assert derived.scale == scale

    x = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32)
    ours = np.asarray(swinir.apply(params, jnp.asarray(x), derived))
    with torch.no_grad():
        theirs = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    theirs = theirs.numpy().transpose(0, 2, 3, 1).clip(0, 1)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_strict_load_catches_unconsumed_keys():
    net = torch_swinir(TINY)
    state = state_numpy(net)
    state["layers.0.mystery.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(KeyError, match="unconsumed"):
        swinir.load_swinir(state)
    # buffers are exempt
    p, _ = swinir.load_swinir(
        {k: v for k, v in state.items() if "mystery" not in k})
    assert p is not None


def test_random_init_forward_all_variants():
    import dataclasses

    for ups in ("pixelshuffle", "pixelshuffledirect", "nearest+conv"):
        cfg = dataclasses.replace(TINY, upsampler=ups)
        p = swinir.init(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 24, 3))
        out = swinir.apply(p, x, cfg)
        assert out.shape == (1, 64, 96, 3), ups
        assert np.isfinite(np.asarray(out)).all()


def test_nonmultiple_window_padding():
    p = swinir.init(jax.random.PRNGKey(0), TINY)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 15, 13, 3))
    out = swinir.apply(p, x, TINY)
    assert out.shape == (1, 60, 52, 3)


def test_window_partition_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 24, 5))
    wins = swinir._window_partition(x, 8)
    back = swinir._window_reverse(wins, 8, 16, 24)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_full_size_config_presets():
    """The published model shapes: real-M 180/6x6, real-L 240/9x6-head-8."""
    assert swinir.SWINIR_M_REAL.embed_dim == 180
    assert len(swinir.SWINIR_L_REAL.depths) == 9
    assert swinir.SWINIR_L_REAL.resi == "3conv"
