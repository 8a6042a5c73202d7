"""InSPyReNet background-removal model: shape/robustness tests plus
numeric parity against the vendored reference torch implementation (used
as an external oracle when present — never shipped)."""

import importlib
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import inspyrenet as isp

REF = "/root/reference/gyre/pipeline/hinters/inspyrenet"


def test_random_init_runs():
    p = isp.init(jax.random.PRNGKey(0), isp.SWIN_TEST)
    img = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    out = np.asarray(jax.jit(
        lambda p, x: isp.apply(p, x, isp.SWIN_TEST))(p, jnp.asarray(img)))
    assert out.shape == (1, 64, 64, 1)
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1


def _shim_modules(torch):
    """timm + kornia shims so the vendored reference imports offline."""
    if "timm.models.layers" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        def trunc_normal_(t, std=1.0, **kw):
            with torch.no_grad():
                t.normal_(0, std).clamp_(-2 * std, 2 * std)
            return t

        class DropPath(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

            def forward(self, x):
                return x

        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = trunc_normal_
        layers.DropPath = DropPath
        timm.models = models
        models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    if "kornia.morphology" not in sys.modules:
        kornia = types.ModuleType("kornia")
        morph = types.ModuleType("kornia.morphology")

        def dilation(x, k):
            return x  # Transition is unused on the threshold=None path

        morph.dilation = dilation
        morph.erosion = dilation
        kornia.morphology = morph
        sys.modules.setdefault("kornia", kornia)
        sys.modules["kornia.morphology"] = morph


def _load_reference():
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REF):
        pytest.skip("reference oracle not available")
    _shim_modules(torch)
    # NOTE: remove the path afterwards — the reference root has its own
    # client.py/server.py that would shadow ours for every later test
    # (the round-2 order-dependent ModuleNotFoundError flake)
    added = "/root/reference" not in sys.path
    if added:
        sys.path.insert(0, "/root/reference")
    try:
        swin_mod = importlib.import_module(
            "gyre.pipeline.hinters.inspyrenet.backbones.SwinTransformer")
        net_mod = importlib.import_module(
            "gyre.pipeline.hinters.inspyrenet.InSPyReNet")
    finally:
        if added and "/root/reference" in sys.path:
            sys.path.remove("/root/reference")
    return torch, swin_mod, net_mod


def test_matches_reference_oracle():
    torch, swin_mod, net_mod = _load_reference()
    cfg = isp.SWIN_TEST
    torch.manual_seed(0)
    backbone = swin_mod.SwinTransformer(
        pretrain_img_size=224, embed_dim=cfg.embed_dim,
        depths=list(cfg.depths), num_heads=list(cfg.heads),
        window_size=cfg.window, ape=False, drop_path_rate=0.0,
        patch_norm=True)
    e = cfg.embed_dim
    net = net_mod.InSPyReNet(backbone, [e, e, 2 * e, 4 * e, 8 * e],
                             depth=8, base_size=[64, 64],
                             threshold=None).eval()
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    # loader expects the backbone under 'backbone.' — state_dict already is
    params, loaded_cfg = isp.load_inspyrenet(state)
    assert loaded_cfg.embed_dim == cfg.embed_dim
    assert loaded_cfg.depths == cfg.depths
    assert loaded_cfg.window == cfg.window

    img = np.random.default_rng(1).random((1, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(isp.apply(params, jnp.asarray(img), loaded_cfg,
                                return_logits=True))
    with torch.no_grad():
        # apply() normalizes internally; feed the oracle the same input
        norm = (img - np.asarray(isp.IMAGE_MEAN, np.float32)) / \
            np.asarray(isp.IMAGE_STD, np.float32)
        t_in = torch.from_numpy(norm.transpose(0, 3, 1, 2))
        out = net.forward_inspyre(t_in)
        theirs = out["saliency"][-1].numpy().transpose(0, 2, 3, 1)
    assert ours.shape == theirs.shape
    scale = max(np.abs(theirs).max(), 1e-4)
    err = np.abs(ours - theirs).max() / scale
    assert err < 5e-2, f"relative error {err:.3f}"
