"""UniFormer+UPerHead segmentation: random-init runs, backbone numeric
parity vs the vendored reference torch implementation (oracle), and the
published upernet checkpoint layout loads key-for-key."""

import importlib
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import uniformer as uni

REF = "/root/reference/gyre/pipeline/hinters/models/uniformer.py"


def test_random_init_runs():
    p = uni.init(jax.random.PRNGKey(0), uni.UNIFORMER_TEST)
    img = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    out = np.asarray(jax.jit(
        lambda p, x: uni.apply(p, x, uni.UNIFORMER_TEST))(
        p, jnp.asarray(img)))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()


def _shim(torch):
    if "timm.models.layers" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)

        def trunc_normal_(t, std=1.0, **kw):
            with torch.no_grad():
                t.normal_(0, std).clamp_(-2 * std, 2 * std)
            return t

        class DropPath(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

            def forward(self, x):
                return x

        layers.trunc_normal_ = trunc_normal_
        layers.DropPath = DropPath
        timm.models = models
        models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    if "mmseg.models.builder" not in sys.modules:
        mmseg = types.ModuleType("mmseg")
        mutils = types.ModuleType("mmseg.utils")
        mutils.get_root_logger = lambda *a, **k: None
        mmodels = types.ModuleType("mmseg.models")
        mbuilder = types.ModuleType("mmseg.models.builder")

        class _Reg:
            def register_module(self, *a, **k):
                return lambda cls: cls

        mbuilder.BACKBONES = _Reg()
        mmseg.utils = mutils
        mmseg.models = mmodels
        mmodels.builder = mbuilder
        sys.modules["mmseg"] = mmseg
        sys.modules["mmseg.utils"] = mutils
        sys.modules["mmseg.models"] = mmodels
        sys.modules["mmseg.models.builder"] = mbuilder


def test_backbone_matches_reference_oracle():
    torch = pytest.importorskip("torch")
    if not os.path.exists(REF):
        pytest.skip("reference oracle not available")
    _shim(torch)
    spec = importlib.util.spec_from_file_location("uni_oracle", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cfg = uni.UNIFORMER_TEST
    torch.manual_seed(0)
    net = mod.UniFormer(layers=list(cfg.layers),
                        embed_dim=list(cfg.embed_dim),
                        head_dim=cfg.head_dim, drop_path_rate=0.0).eval()
    # randomize BN affine + running stats so folding is actually tested
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    state = {"backbone." + k: v.detach().numpy()
             for k, v in net.state_dict().items()}
    # minimal decode head so the loader completes (tested separately)
    f = cfg.fpn_channels
    rng = np.random.default_rng(0)

    def conv(pre, cin, cout, k):
        state[f"{pre}.weight"] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) * 0.05
        state[f"{pre}.bias"] = np.zeros(cout, np.float32)

    for i in range(4):
        conv(f"decode_head.psp_modules.{i}.1.conv", cfg.embed_dim[-1],
             f, 1)
    conv("decode_head.bottleneck.conv", cfg.embed_dim[-1] + 4 * f, f, 3)
    for i in range(3):
        conv(f"decode_head.lateral_convs.{i}.conv", cfg.embed_dim[i], f, 1)
        conv(f"decode_head.fpn_convs.{i}.conv", f, f, 3)
    conv("decode_head.fpn_bottleneck.conv", 4 * f, f, 3)
    conv("decode_head.conv_seg", f, cfg.num_classes, 1)

    params, lcfg = uni.load_uniformer(state, head_dim=cfg.head_dim)
    assert lcfg.layers == cfg.layers
    assert lcfg.embed_dim == cfg.embed_dim

    img = np.random.default_rng(1).random((1, 64, 64, 3)).astype(np.float32)
    ours = uni.backbone_apply(params["backbone"], lcfg, jnp.asarray(img))
    with torch.no_grad():
        theirs = net(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    for i, (a, b) in enumerate(zip(theirs, ours)):
        a = a.numpy().transpose(0, 2, 3, 1)
        b = np.asarray(b)
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        assert err < 2e-3, f"stage {i}: relerr {err:.2e}"

    out = np.asarray(uni.apply(params, jnp.asarray(img), lcfg))
    assert out.shape == (1, 64, 64, 3)
