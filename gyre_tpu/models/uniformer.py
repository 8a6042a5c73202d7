"""UniFormer + UPerHead semantic segmentation (the seg hinter).

The reference's segmentation hinter runs mmseg over the vendored
UniFormer backbone (gyre/pipeline/hinters/mmseg_pipeline.py +
hinters/models/uniformer.py, the upernet_global_small configuration the
ControlNet-seg annotator uses). Rebuilt here NHWC:

  * backbone — two convolutional MHRA stages (CBlock: depthwise pos
    conv, BN-gated 1x1/5x5dw/1x1 mixer, conv MLP) and two self-attention
    stages (SABlock: LN + fused-qkv global attention), patch embeds with
    channel-last LN, per-stage output LN;
  * decode head — mmseg UPerHead: PSP pooling over the last stage,
    FPN lateral fusion, per-level FPN convs, concat bottleneck, 1x1
    class head; BatchNorms fold into convs at load.

Renders use the full canonical 150-class ADE20K palette (the public
mmseg table the reference's show_result uses) — replaceable wholesale
via the engine's `palette` option.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import layers as L

Params = dict


@dataclasses.dataclass(frozen=True)
class UniFormerConfig:
    layers: tuple = (3, 4, 8, 3)          # upernet_global_small
    embed_dim: tuple = (64, 128, 320, 512)
    head_dim: int = 64
    mlp_ratio: int = 4
    num_classes: int = 150
    fpn_channels: int = 512
    pool_scales: tuple = (1, 2, 3, 6)


UNIFORMER_SMALL = UniFormerConfig()
UNIFORMER_TEST = UniFormerConfig(
    layers=(1, 1, 1, 1), embed_dim=(8, 16, 24, 32), head_dim=8,
    num_classes=16, fpn_channels=16)


# full canonical ADE20K palette (the public mmseg `get_palette("ade")`
# table the reference renders with via show_result; 150 classes)
_ADE_PALETTE = [
    (120, 120, 120), (180, 120, 120), (6, 230, 230), (80, 50, 50),
    (4, 200, 3), (120, 120, 80), (140, 140, 140), (204, 5, 255),
    (230, 230, 230), (4, 250, 7), (224, 5, 255), (235, 255, 7),
    (150, 5, 61), (120, 120, 70), (8, 255, 51), (255, 6, 82),
    (143, 255, 140), (204, 255, 4), (255, 51, 7), (204, 70, 3),
    (0, 102, 200), (61, 230, 250), (255, 6, 51), (11, 102, 255),
    (255, 7, 71), (255, 9, 224), (9, 7, 230), (220, 220, 220),
    (255, 9, 92), (112, 9, 255), (8, 255, 214), (7, 255, 224),
    (255, 184, 6), (10, 255, 71), (255, 41, 10), (7, 255, 255),
    (224, 255, 8), (102, 8, 255), (255, 61, 6), (255, 194, 7),
    (255, 122, 8), (0, 255, 20), (255, 8, 41), (255, 5, 153),
    (6, 51, 255), (235, 12, 255), (160, 150, 20), (0, 163, 255),
    (140, 140, 140), (250, 10, 15), (20, 255, 0), (31, 255, 0),
    (255, 31, 0), (255, 224, 0), (153, 255, 0), (0, 0, 255),
    (255, 71, 0), (0, 235, 255), (0, 173, 255), (31, 0, 255),
    (11, 200, 200), (255, 82, 0), (0, 255, 245), (0, 61, 255),
    (0, 255, 112), (0, 255, 133), (255, 0, 0), (255, 163, 0),
    (255, 102, 0), (194, 255, 0), (0, 143, 255), (51, 255, 0),
    (0, 82, 255), (0, 255, 41), (0, 255, 173), (10, 0, 255),
    (173, 255, 0), (0, 255, 153), (255, 92, 0), (255, 0, 255),
    (255, 0, 245), (255, 0, 102), (255, 173, 0), (255, 0, 20),
    (255, 184, 184), (0, 31, 255), (0, 255, 61), (0, 71, 255),
    (255, 0, 204), (0, 255, 194), (0, 255, 82), (0, 10, 255),
    (0, 112, 255), (51, 0, 255), (0, 194, 255), (0, 122, 255),
    (0, 255, 163), (255, 153, 0), (0, 255, 10), (255, 112, 0),
    (143, 255, 0), (82, 0, 255), (163, 255, 0), (255, 235, 0),
    (8, 184, 170), (133, 0, 255), (0, 255, 92), (184, 0, 255),
    (255, 0, 31), (0, 184, 255), (0, 214, 255), (255, 0, 112),
    (92, 255, 0), (0, 224, 255), (112, 224, 255), (70, 184, 160),
    (163, 0, 255), (153, 0, 255), (71, 255, 0), (255, 0, 163),
    (255, 204, 0), (255, 0, 143), (0, 255, 235), (133, 255, 0),
    (255, 0, 235), (245, 0, 255), (255, 0, 122), (255, 245, 0),
    (10, 190, 212), (214, 255, 0), (0, 204, 255), (20, 0, 255),
    (255, 255, 0), (0, 153, 255), (0, 41, 255), (0, 255, 204),
    (41, 0, 255), (41, 255, 0), (173, 0, 255), (0, 245, 255),
    (71, 0, 255), (122, 0, 255), (0, 255, 184), (0, 92, 255),
    (184, 255, 0), (0, 133, 255), (255, 214, 0), (25, 194, 194),
    (102, 255, 0), (92, 0, 255),
]


def ade_palette(n: int = 150) -> np.ndarray:
    pal = list(_ADE_PALETTE)
    rng = np.random.RandomState(37)
    while len(pal) < n:   # n > 150: stable generated fill
        pal.append(tuple(int(v) for v in rng.randint(0, 255, 3)))
    return np.asarray(pal[:n], np.float32) / 255.0


# -------------------------------------------------------------- backbone


def _conv_init(key, k, c_in, c_out, dtype, groups=1):
    return {"w": jax.random.normal(
        key, (k, k, c_in // groups, c_out), dtype) * 0.05,
        "b": jnp.zeros((c_out,), dtype)}


def _cblock_init(key, dim, ratio, dtype):
    ks = iter(jax.random.split(key, 8))
    return {
        "pos": _conv_init(next(ks), 3, dim, dim, dtype, groups=dim),
        "conv1": _conv_init(next(ks), 1, dim, dim, dtype),
        "attn": _conv_init(next(ks), 5, dim, dim, dtype, groups=dim),
        "conv2": _conv_init(next(ks), 1, dim, dim, dtype),
        "fc1": _conv_init(next(ks), 1, dim, dim * ratio, dtype),
        "fc2": _conv_init(next(ks), 1, dim * ratio, dim, dtype),
    }


def _cblock(p, x):
    """Conv MHRA block; the pre-norm BatchNorms are folded into conv1/fc1
    at load (random init is the folded form)."""
    dim = x.shape[-1]
    x = x + L.conv2d(p["pos"], x, feature_group_count=dim)
    h = L.conv2d(p["conv1"], x)
    h = L.conv2d(p["attn"], h, feature_group_count=dim)
    x = x + L.conv2d(p["conv2"], h)
    h = jax.nn.gelu(L.conv2d(p["fc1"], x), approximate=False)
    return x + L.conv2d(p["fc2"], h)


def _sablock_init(key, dim, ratio, dtype):
    ks = iter(jax.random.split(key, 6))
    return {
        "pos": _conv_init(next(ks), 3, dim, dim, dtype, groups=dim),
        "ln1": L.norm_init(dim, dtype),
        "qkv": L.linear_init(next(ks), dim, 3 * dim, dtype),
        "proj": L.linear_init(next(ks), dim, dim, dtype),
        "ln2": L.norm_init(dim, dtype),
        "fc1": L.linear_init(next(ks), dim, dim * ratio, dtype),
        "fc2": L.linear_init(next(ks), dim * ratio, dim, dtype),
    }


def _sablock(p, x, heads):
    b, h, w, c = x.shape
    x = x + L.conv2d(p["pos"], x, feature_group_count=c)
    t = x.reshape(b, h * w, c)
    n = L.layer_norm(p["ln1"], t)
    qkv = L.linear(p["qkv"], n).reshape(b, h * w, 3, heads, c // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    o = L.attention(q, k, v).reshape(b, h * w, c)
    t = t + L.linear(p["proj"], o)
    n = L.layer_norm(p["ln2"], t)
    t = t + L.linear(p["fc2"],
                     jax.nn.gelu(L.linear(p["fc1"], n), approximate=False))
    return t.reshape(b, h, w, c)


def backbone_init(key, cfg: UniFormerConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 128))
    p: Params = {"patch": [], "stages": [], "norms": []}
    c_prev = 3
    for si, (depth, dim) in enumerate(zip(cfg.layers, cfg.embed_dim)):
        patch = 4 if si == 0 else 2
        p["patch"].append({
            "proj": _conv_init(next(ks), patch, c_prev, dim, dtype),
            "norm": L.norm_init(dim, dtype)})
        blocks = []
        for _ in range(depth):
            if si < 2:
                blocks.append(_cblock_init(next(ks), dim, cfg.mlp_ratio,
                                           dtype))
            else:
                blocks.append(_sablock_init(next(ks), dim, cfg.mlp_ratio,
                                            dtype))
        p["stages"].append(blocks)
        p["norms"].append(L.norm_init(dim, dtype))
        c_prev = dim
    return p


def backbone_apply(params: Params, cfg: UniFormerConfig, x: jax.Array):
    outs = []
    for si, (patch, blocks, onorm) in enumerate(zip(
            params["patch"], params["stages"], params["norms"])):
        stride = 4 if si == 0 else 2
        x = L.conv2d(patch["proj"], x, stride=stride, padding="VALID")
        x = L.layer_norm(patch["norm"], x)
        heads = cfg.embed_dim[si] // cfg.head_dim
        for blk in blocks:
            x = _cblock(blk, x) if si < 2 else _sablock(blk, x, heads)
        outs.append(L.layer_norm(onorm, x))
    return outs


# -------------------------------------------------------------- UPerHead


def _adaptive_pool(x, k):
    """torch AdaptiveAvgPool2d(k) over NHWC: k nearly-equal segments."""
    b, h, w, c = x.shape
    rows = [x[:, int(np.floor(i * h / k)):int(np.ceil((i + 1) * h / k))]
            for i in range(k)]
    pooled = []
    for r in rows:
        cols = [r[:, :, int(np.floor(j * w / k)):
                  int(np.ceil((j + 1) * w / k))].mean(axis=(1, 2))
                for j in range(k)]
        pooled.append(jnp.stack(cols, axis=1))
    return jnp.stack(pooled, axis=1)          # [B,k,k,C]


def head_init(key, cfg: UniFormerConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 32))
    f = cfg.fpn_channels
    dims = cfg.embed_dim
    return {
        "psp": [_conv_init(next(ks), 1, dims[-1], f, dtype)
                for _ in cfg.pool_scales],
        "bottleneck": _conv_init(
            next(ks), 3, dims[-1] + f * len(cfg.pool_scales), f, dtype),
        "laterals": [_conv_init(next(ks), 1, d, f, dtype)
                     for d in dims[:-1]],
        "fpn": [_conv_init(next(ks), 3, f, f, dtype)
                for _ in dims[:-1]],
        "fpn_bottleneck": _conv_init(next(ks), 3, f * len(dims), f, dtype),
        "seg": _conv_init(next(ks), 1, f, cfg.num_classes, dtype),
    }


def head_apply(params: Params, cfg: UniFormerConfig, feats):
    """mmseg UPerHead forward (align_corners=False throughout)."""
    def up(x, size):
        return jax.image.resize(
            x, (x.shape[0], size[0], size[1], x.shape[-1]), "bilinear")

    top = feats[-1]
    size = top.shape[1:3]
    psp = [top]
    for scale, conv in zip(cfg.pool_scales, params["psp"]):
        p = jax.nn.relu(L.conv2d(conv, _adaptive_pool(top, scale)))
        psp.append(up(p, size))
    top = jax.nn.relu(L.conv2d(params["bottleneck"],
                               jnp.concatenate(psp, axis=-1)))

    laterals = [jax.nn.relu(L.conv2d(conv, f))
                for conv, f in zip(params["laterals"], feats[:-1])]
    laterals.append(top)
    for i in range(len(laterals) - 1, 0, -1):
        laterals[i - 1] = laterals[i - 1] + up(
            laterals[i], laterals[i - 1].shape[1:3])
    outs = [jax.nn.relu(L.conv2d(conv, lat))
            for conv, lat in zip(params["fpn"], laterals[:-1])]
    outs.append(laterals[-1])
    size0 = outs[0].shape[1:3]
    outs = [up(o, size0) for o in outs]
    x = jax.nn.relu(L.conv2d(params["fpn_bottleneck"],
                             jnp.concatenate(outs, axis=-1)))
    return L.conv2d(params["seg"], x)


# ----------------------------------------------------------------- model


IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)


def init(key, cfg: UniFormerConfig = UNIFORMER_SMALL,
         dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {"backbone": backbone_init(k1, cfg, dtype),
            "head": head_init(k2, cfg, dtype)}


def apply(params: Params, images: jax.Array,
          cfg: UniFormerConfig = UNIFORMER_SMALL,
          palette: np.ndarray | None = None) -> jax.Array:
    """images [B,H,W,3] 0..1 -> ADE-palette segmentation render
    [B,H,W,3] (the reference renders show_result with the ade palette,
    mmseg_pipeline.py:37-41)."""
    b, h, w, _ = images.shape
    x = (images - jnp.asarray(IMAGE_MEAN, images.dtype)) / \
        jnp.asarray(IMAGE_STD, images.dtype)
    feats = backbone_apply(params["backbone"], cfg, x)
    logits = head_apply(params["head"], cfg, feats)
    logits = jax.image.resize(
        logits, (b, h, w, logits.shape[-1]), "bilinear")
    classes = jnp.argmax(logits, axis=-1)
    pal = jnp.asarray(palette if palette is not None
                      else ade_palette(cfg.num_classes))
    return pal[classes]


# ----------------------------------------------------------------- loader


def load_uniformer(state: dict, dtype=None, head_dim: int = 64):
    """upernet_global_small-style checkpoint (backbone.* UniFormer +
    decode_head.* UPerHead mmseg naming; auxiliary_head ignored) ->
    (params, UniFormerConfig). BatchNorms fold into the following convs
    (backbone CBlocks) or preceding convs (mmseg ConvModules)."""
    from .load import _t_conv, _t_linear

    if any(k.startswith("state_dict.") for k in state):
        state = {k[len("state_dict."):]: v for k, v in state.items()}

    def j(a):
        return jnp.asarray(a, dtype) if dtype else jnp.asarray(a)

    def raw_conv(pre, depthwise=False):
        w = np.asarray(state[f"{pre}.weight"], np.float32)
        w = np.transpose(w, (2, 3, 1, 0))
        b = np.asarray(state.get(f"{pre}.bias",
                                 np.zeros(w.shape[-1], np.float32)))
        return w, b

    def conv_p(pre):
        w, b = raw_conv(pre)
        return {"w": j(w), "b": j(b)}

    def bn_fold_into_next(bnpre, conv_w, conv_b, eps=1e-5):
        """y = conv(bn(x)): scale conv input channels."""
        g = np.asarray(state[f"{bnpre}.weight"])
        bt = np.asarray(state[f"{bnpre}.bias"])
        rm = np.asarray(state[f"{bnpre}.running_mean"])
        rv = np.asarray(state[f"{bnpre}.running_var"])
        s = g / np.sqrt(rv + eps)
        t = bt - rm * s
        # conv_w HWIO: scale input axis; bias += sum_k W[...,i,:]*t_i
        w2 = conv_w * s[None, None, :, None]
        b2 = conv_b + np.einsum("hwio,i->o", conv_w, t)
        return w2, b2

    def conv_bn_after(cpre, bnpre, eps=1e-5):
        """mmseg ConvModule: conv then BN -> fold onto output axis."""
        w, b = raw_conv(cpre)
        if f"{bnpre}.weight" in state:
            g = np.asarray(state[f"{bnpre}.weight"])
            bt = np.asarray(state[f"{bnpre}.bias"])
            rm = np.asarray(state[f"{bnpre}.running_mean"])
            rv = np.asarray(state[f"{bnpre}.running_var"])
            s = g / np.sqrt(rv + eps)
            w = w * s[None, None, None, :]
            b = (b - rm) * s + bt
        return {"w": j(w), "b": j(b)}

    def lin(pre):
        p = {"w": j(_t_linear(np.asarray(state[f"{pre}.weight"])))}
        if f"{pre}.bias" in state:
            p["b"] = j(np.asarray(state[f"{pre}.bias"]))
        return p

    def norm(pre):
        return {"scale": j(np.asarray(state[f"{pre}.weight"])),
                "bias": j(np.asarray(state[f"{pre}.bias"]))}

    bb = "backbone."
    dims = []
    layers = []
    for si in range(1, 5):
        w = np.asarray(state[f"{bb}patch_embed{si}.proj.weight"])
        dims.append(int(w.shape[0]))
        d = 0
        while f"{bb}blocks{si}.{d}.pos_embed.weight" in state:
            d += 1
        layers.append(d)
    n_classes = int(np.asarray(
        state["decode_head.conv_seg.weight"]).shape[0])
    fpn = int(np.asarray(
        state["decode_head.fpn_bottleneck.conv.weight"]).shape[0])
    cfg = UniFormerConfig(layers=tuple(layers), embed_dim=tuple(dims),
                          head_dim=head_dim, num_classes=n_classes,
                          fpn_channels=fpn)

    patch, stages, norms = [], [], []
    for si in range(1, 5):
        patch.append({"proj": conv_p(f"{bb}patch_embed{si}.proj"),
                      "norm": norm(f"{bb}patch_embed{si}.norm")})
        blocks = []
        for bi in range(layers[si - 1]):
            pre = f"{bb}blocks{si}.{bi}"
            if si <= 2:
                c1w, c1b = raw_conv(f"{pre}.conv1")
                c1w, c1b = bn_fold_into_next(f"{pre}.norm1", c1w, c1b)
                f1w, f1b = raw_conv(f"{pre}.mlp.fc1")
                f1w, f1b = bn_fold_into_next(f"{pre}.norm2", f1w, f1b)
                blocks.append({
                    "pos": conv_p(f"{pre}.pos_embed"),
                    "conv1": {"w": j(c1w), "b": j(c1b)},
                    "attn": conv_p(f"{pre}.attn"),
                    "conv2": conv_p(f"{pre}.conv2"),
                    "fc1": {"w": j(f1w), "b": j(f1b)},
                    "fc2": conv_p(f"{pre}.mlp.fc2"),
                })
            else:
                blocks.append({
                    "pos": conv_p(f"{pre}.pos_embed"),
                    "ln1": norm(f"{pre}.norm1"),
                    "qkv": lin(f"{pre}.attn.qkv"),
                    "proj": lin(f"{pre}.attn.proj"),
                    "ln2": norm(f"{pre}.norm2"),
                    "fc1": lin(f"{pre}.mlp.fc1"),
                    "fc2": lin(f"{pre}.mlp.fc2"),
                })
        stages.append(blocks)
        norms.append(norm(f"{bb}norm{si}"))
    backbone = {"patch": patch, "stages": stages, "norms": norms}

    dh = "decode_head."
    head = {
        "psp": [conv_bn_after(f"{dh}psp_modules.{i}.1.conv",
                              f"{dh}psp_modules.{i}.1.bn")
                for i in range(4)],
        "bottleneck": conv_bn_after(f"{dh}bottleneck.conv",
                                    f"{dh}bottleneck.bn"),
        "laterals": [conv_bn_after(f"{dh}lateral_convs.{i}.conv",
                                   f"{dh}lateral_convs.{i}.bn")
                     for i in range(3)],
        "fpn": [conv_bn_after(f"{dh}fpn_convs.{i}.conv",
                              f"{dh}fpn_convs.{i}.bn")
                for i in range(3)],
        "fpn_bottleneck": conv_bn_after(f"{dh}fpn_bottleneck.conv",
                                        f"{dh}fpn_bottleneck.bn"),
        "seg": conv_p(f"{dh}conv_seg"),
    }
    return {"backbone": backbone, "head": head}, cfg
