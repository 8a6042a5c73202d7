"""Hinter models: monocular depth and soft-edge estimation.

The reference vendors MiDaS/ZoeDepth for depth (gyre/pipeline/depth/) and
HED/DexiNed for edges (gyre/pipeline/hinters/hed_pipeline.py) as torch
checkpoints. Here:

  * DepthNet — a MiDaS-v2-small-shaped encoder/decoder: strided residual
    conv encoder (4 levels), RefineNet-style decoder with skip fusion,
    inverse-depth head. Same preprocessing/normalization contract as the
    reference's MidasDepthPipeline (resize -> model -> bicubic resize ->
    min/max normalize, gyre/pipeline/depth/midas_depth_pipeline.py:1-54).
  * HEDNet — the real HED topology: VGG-16 conv stages with per-stage
    side outputs upsampled and fused 1x1 (weight-loadable from public HED
    checkpoints via load_hed_params).

Without local weights they random-init; the serving path, shapes, and
performance are identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L

Params = dict


# ----------------------------------------------------------------- DepthNet


def _res_init(key, c_in, c_out, stride, dtype):
    ks = jax.random.split(key, 3)
    p = {"conv1": L.conv_init(ks[0], 3, 3, c_in, c_out, dtype),
         "conv2": L.conv_init(ks[1], 3, 3, c_out, c_out, dtype),
         "norm1": L.norm_init(c_out, dtype),
         "norm2": L.norm_init(c_out, dtype)}
    if stride != 1 or c_in != c_out:
        p["skip"] = L.conv_init(ks[2], 1, 1, c_in, c_out, dtype)
    return p


def _res_block(p, x, stride=1, groups=8):
    h = L.conv2d(p["conv1"], x, stride=stride, padding=[(1, 1), (1, 1)])
    h = jax.nn.relu(L.group_norm(p["norm1"], h, groups))
    h = L.conv2d(p["conv2"], h)
    h = L.group_norm(p["norm2"], h, groups)
    skip = L.conv2d(p["skip"], x, stride=stride) if "skip" in p else x
    return jax.nn.relu(h + skip)


def depth_init(key, widths=(32, 64, 128, 256), dtype=jnp.float32) -> Params:
    """Generic encoder-decoder response net. Real depth estimation now
    lives in models/dpt.py (DPT/MiDaS with checkpoint loading); this stays
    as the shared backbone for the saliency and segmentation hinters."""
    ks = iter(jax.random.split(key, 32))
    p: Params = {"stem": L.conv_init(next(ks), 3, 3, 3, widths[0], dtype),
                 "enc": [], "fuse": [], "refine": []}
    c_prev = widths[0]
    for w in widths:
        p["enc"].append(_res_init(next(ks), c_prev, w, 2, dtype))
        c_prev = w
    dec_w = widths[0] * 2
    for w in reversed(widths):
        p["fuse"].append(L.conv_init(next(ks), 1, 1, w, dec_w, dtype))
        p["refine"].append(_res_init(next(ks), dec_w, dec_w, 1, dtype))
    p["head1"] = L.conv_init(next(ks), 3, 3, dec_w, dec_w // 2, dtype)
    p["head2"] = L.conv_init(next(ks), 3, 3, dec_w // 2, 1, dtype)
    return p


def depth_apply(params: Params, images: jax.Array) -> jax.Array:
    """images [B,H,W,3] 0..1 -> inverse depth [B,H,W,1], min/max
    normalized to 0..1 per sample (the reference pipeline's contract)."""
    b, h, w, _ = images.shape
    x = images * 2.0 - 1.0
    feats = []
    f = L.conv2d(params["stem"], x)
    for enc in params["enc"]:
        f = _res_block(enc, f, stride=2)
        feats.append(f)
    out = None
    for fuse, refine, skip in zip(params["fuse"], params["refine"],
                                  reversed(feats)):
        lat = L.conv2d(fuse, skip)
        out = lat if out is None else lat + L.upsample_nearest_2x(out)
        out = _res_block(refine, out)
    out = L.upsample_nearest_2x(out)
    out = jax.nn.relu(L.conv2d(params["head1"], out))
    depth = L.conv2d(params["head2"], out)
    depth = jax.image.resize(depth, (b, h, w, 1), "bicubic")
    dmin = jnp.min(depth, axis=(1, 2, 3), keepdims=True)
    dmax = jnp.max(depth, axis=(1, 2, 3), keepdims=True)
    return (depth - dmin) / jnp.maximum(dmax - dmin, 1e-6)


# ----------------------------------------------- saliency / segmentation


def saliency_init(key, widths=(32, 64, 128, 256),
                  dtype=jnp.float32) -> Params:
    """Salient-object network (the reference's background-removal model is
    InSPyReNet, gyre/pipeline/hinters/; same encoder/decoder shape as
    DepthNet with a sigmoid mask head)."""
    p = depth_init(key, widths, dtype)
    return p


def saliency_apply(params: Params, images: jax.Array) -> jax.Array:
    """-> foreground mask [B,H,W,1] in 0..1."""
    b, h, w, _ = images.shape
    d = depth_apply(params, images)  # normalized response map
    # sharpen into a mask: the head's normalized response thresholds softly
    return jax.nn.sigmoid((d - 0.5) * 10.0)


def remove_background(params: Params, images: jax.Array,
                      mode: str = "alpha") -> jax.Array:
    """-> RGBA (alpha mode) or RGB-on-white (solid mode); reference
    BackgroundRemoval modes."""
    mask = saliency_apply(params, images)
    if mode == "solid":
        return images * mask + (1.0 - mask)
    return jnp.concatenate([images[..., :3], mask], axis=-1)


# ADE20k-ish palette for segmentation rendering (stable, arbitrary colors)
def _seg_palette(n: int) -> np.ndarray:
    rs = np.random.RandomState(7)
    pal = rs.rand(n, 3).astype(np.float32)
    pal[0] = 0.0
    return pal


def seg_init(key, n_classes: int = 16, widths=(32, 64, 128, 256),
             dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 2)
    p = depth_init(ks[0], widths, dtype)
    dec_w = widths[0] * 2
    p["head2"] = L.conv_init(ks[1], 3, 3, dec_w // 2, n_classes, dtype)
    return p


def seg_apply(params: Params, images: jax.Array) -> jax.Array:
    """-> class-colored segmentation map [B,H,W,3] (reference mmseg
    pipeline contract: palette-rendered classes)."""
    b, h, w, _ = images.shape
    n = params["head2"]["w"].shape[-1]  # static: class count from the head
    x = images * 2.0 - 1.0
    feats = []
    f = L.conv2d(params["stem"], x)
    for enc in params["enc"]:
        f = _res_block(enc, f, stride=2)
        feats.append(f)
    out = None
    for fuse, refine, skip in zip(params["fuse"], params["refine"],
                                  reversed(feats)):
        lat = L.conv2d(fuse, skip)
        out = lat if out is None else lat + L.upsample_nearest_2x(out)
        out = _res_block(refine, out)
    out = L.upsample_nearest_2x(out)
    out = jax.nn.relu(L.conv2d(params["head1"], out))
    logits = L.conv2d(params["head2"], out)
    logits = jax.image.resize(logits, (b, h, w, n), "bilinear")
    classes = jnp.argmax(logits, axis=-1)
    palette = jnp.asarray(_seg_palette(n))
    return palette[classes]


# -------------------------------------------------------------------- HED


_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


def hed_init(key, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 64))
    p: Params = {"stages": [], "sides": []}
    c_prev = 3
    for c_out, n_convs in _VGG_STAGES:
        stage = []
        for _ in range(n_convs):
            stage.append(L.conv_init(next(ks), 3, 3, c_prev, c_out, dtype))
            c_prev = c_out
        p["stages"].append(stage)
        p["sides"].append(L.conv_init(next(ks), 1, 1, c_out, 1, dtype))
    p["fuse"] = L.conv_init(next(ks), 1, 1, len(_VGG_STAGES), 1, dtype,
                            bias=False)
    return p


def hed_apply(params: Params, images: jax.Array) -> jax.Array:
    """images [B,H,W,3] 0..1 -> soft edges [B,H,W,1] in 0..1."""
    b, h, w, _ = images.shape
    x = images * 255.0 - jnp.asarray([104.0, 117.0, 123.0], images.dtype)
    sides = []
    for i, (stage, side) in enumerate(zip(params["stages"],
                                          params["sides"])):
        if i > 0:
            x = L.avg_pool_2x(x)
        for conv in stage:
            x = jax.nn.relu(L.conv2d(conv, x))
        s = L.conv2d(side, x)
        sides.append(jax.image.resize(s, (b, h, w, 1), "bilinear"))
    fused = L.conv2d(params["fuse"], jnp.concatenate(sides, axis=-1))
    return jax.nn.sigmoid(fused)


def load_hed_params(state: dict, dtype=None) -> Params:
    """Public HED checkpoint (caffe-style 'conv1_1.weight' ... naming used
    by the ControlNet-annotator release) -> our tree."""
    from .load import _t_conv

    def conv(prefix, bias=True):
        w = np.asarray(state[f"{prefix}.weight"])
        p = {"w": jnp.asarray(_t_conv(w), dtype) if dtype
             else jnp.asarray(_t_conv(w))}
        if bias and f"{prefix}.bias" in state:
            p["b"] = jnp.asarray(np.asarray(state[f"{prefix}.bias"]))
        return p

    p: Params = {"stages": [], "sides": []}
    for i, (_, n_convs) in enumerate(_VGG_STAGES):
        p["stages"].append([conv(f"conv{i + 1}_{j + 1}")
                            for j in range(n_convs)])
        p["sides"].append(conv(f"score_dsn{i + 1}"))
    p["fuse"] = conv("score_final", bias=False)
    return p


# ------------------------------------------------- InformativeDrawings

# Line-art hinter (reference vendors the "informative-drawings" generator,
# gyre/pipeline/hinters/models/informative_drawings.py:60-111, served via
# informative_drawing_pipeline.py): reflection-padded 7x7 stem, two
# stride-2 downsamples, 9 instance-norm residual blocks, two transposed-
# conv upsamples, 7x7 sigmoid head. InstanceNorm is affine-free, so the
# checkpoint is convs only.


def drawings_init(key, n_blocks: int = 9, base: int = 64,
                  dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 8 + 2 * n_blocks))
    p: Params = {
        "stem": L.conv_init(next(ks), 7, 7, 3, base, dtype),
        "down": [L.conv_init(next(ks), 3, 3, base, base * 2, dtype),
                 L.conv_init(next(ks), 3, 3, base * 2, base * 4, dtype)],
        "blocks": [
            {"conv1": L.conv_init(next(ks), 3, 3, base * 4, base * 4, dtype),
             "conv2": L.conv_init(next(ks), 3, 3, base * 4, base * 4, dtype)}
            for _ in range(n_blocks)],
        "up": [L.conv_init(next(ks), 3, 3, base * 4, base * 2, dtype),
               L.conv_init(next(ks), 3, 3, base * 2, base, dtype)],
        "head": L.conv_init(next(ks), 7, 7, base, 1, dtype),
    }
    return p


def drawings_apply(params: Params, images: jax.Array) -> jax.Array:
    """images [B,H,W,3] 0..1 -> line-art [B,H,W,1] 0..1 (sigmoid)."""
    x = L.conv2d(params["stem"], L.reflect_pad2d(images, 3),
                 padding="VALID")
    x = jax.nn.relu(L.instance_norm(x))
    for conv in params["down"]:
        x = L.conv2d(conv, x, stride=2, padding=[(1, 1), (1, 1)])
        x = jax.nn.relu(L.instance_norm(x))
    for blk in params["blocks"]:
        h = L.conv2d(blk["conv1"], L.reflect_pad2d(x, 1), padding="VALID")
        h = jax.nn.relu(L.instance_norm(h))
        h = L.conv2d(blk["conv2"], L.reflect_pad2d(h, 1), padding="VALID")
        x = x + L.instance_norm(h)
    for conv in params["up"]:
        x = L.conv_transpose2d(conv, x, stride=2, padding=1,
                               output_padding=1)
        x = jax.nn.relu(L.instance_norm(x))
    x = L.conv2d(params["head"], L.reflect_pad2d(x, 3), padding="VALID")
    return jax.nn.sigmoid(x)


def load_drawings_params(state: dict, dtype=None) -> Params:
    """Published informative-drawings checkpoint (model0.1 / model1.{0,3} /
    model2.{k}.conv_block.{1,5} / model3.{0,3} / model4.1 Sequential key
    names) -> our tree. model3.* are ConvTranspose2d weights
    ([in,out,kh,kw] -> HWIO without output-channel transpose)."""
    from .load import _t_conv

    def conv(prefix):
        w = np.asarray(state[f"{prefix}.weight"])
        p = {"w": jnp.asarray(_t_conv(w), dtype) if dtype
             else jnp.asarray(_t_conv(w))}
        if f"{prefix}.bias" in state:
            p["b"] = jnp.asarray(np.asarray(state[f"{prefix}.bias"]), dtype)
        return p

    def convT(prefix):
        w = np.asarray(state[f"{prefix}.weight"])   # [in, out, kh, kw]
        w = np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))
        p = {"w": jnp.asarray(w, dtype) if dtype else jnp.asarray(w)}
        if f"{prefix}.bias" in state:
            p["b"] = jnp.asarray(np.asarray(state[f"{prefix}.bias"]), dtype)
        return p

    n_blocks = 0
    while f"model2.{n_blocks}.conv_block.1.weight" in state:
        n_blocks += 1
    return {
        "stem": conv("model0.1"),
        "down": [conv("model1.0"), conv("model1.3")],
        "blocks": [{"conv1": conv(f"model2.{k}.conv_block.1"),
                    "conv2": conv(f"model2.{k}.conv_block.5")}
                   for k in range(n_blocks)],
        "up": [convT("model3.0"), convT("model3.3")],
        "head": conv("model4.1"),
    }


# --------------------------------------------------------------- DexiNed

# Dense-inception edge detector (reference serves kornia.filters.DexiNed
# via dexined_pipeline.py:26-48: input scaled to 0..255, last side output,
# min/max normalised). Topology: stride-2 double-conv stem, a plain
# double-conv block, four dense blocks joined by maxpool skips and 1x1
# "pre-dense"/side projections, six deconv side-output heads and a 1x1
# fusion over their concat. BatchNorms are folded into convs at load
# time, so inference is convs-only.

_DEXI_DENSE = ((2, 128, 256), (3, 256, 512), (3, 512, 512), (3, 512, 256))


def _dexi_conv_init(ks, kh, c_in, c_out, dtype):
    return L.conv_init(next(ks), kh, kh, c_in, c_out, dtype)


def dexined_init(key, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 128))
    p: Params = {
        "block1": [_dexi_conv_init(ks, 3, 3, 32, dtype),
                   _dexi_conv_init(ks, 3, 32, 64, dtype)],
        "block2": [_dexi_conv_init(ks, 3, 64, 128, dtype),
                   _dexi_conv_init(ks, 3, 128, 128, dtype)],
        "side": [_dexi_conv_init(ks, 1, 64, 128, dtype),
                 _dexi_conv_init(ks, 1, 128, 256, dtype),
                 _dexi_conv_init(ks, 1, 256, 512, dtype),
                 _dexi_conv_init(ks, 1, 512, 512, dtype)],
        "pre": {
            "2": _dexi_conv_init(ks, 1, 128, 256, dtype),
            "3": _dexi_conv_init(ks, 1, 128, 256, dtype),
            "4": _dexi_conv_init(ks, 1, 256, 512, dtype),
            "5": _dexi_conv_init(ks, 1, 512, 512, dtype),
            "6": _dexi_conv_init(ks, 1, 512, 256, dtype),
        },
        "dense": [], "up": [], }
    for n_layers, c_in, c_out in _DEXI_DENSE:
        blk = []
        for i in range(n_layers):
            blk.append({
                "conv1": _dexi_conv_init(ks, 3, c_in if i == 0 else c_out,
                                         c_out, dtype),
                "conv2": _dexi_conv_init(ks, 3, c_out, c_out, dtype)})
        p["dense"].append(blk)
    for c_in, up_scale in ((64, 1), (128, 1), (256, 2), (512, 3),
                           (512, 4), (256, 4)):
        stages = []
        feats = c_in
        for i in range(up_scale):
            out_f = 1 if i == up_scale - 1 else 16
            stages.append({
                "proj": _dexi_conv_init(ks, 1, feats, out_f, dtype),
                "deconv": L.conv_init(next(ks), 2 ** up_scale,
                                      2 ** up_scale, out_f, out_f, dtype)})
            feats = out_f
        p["up"].append(stages)
    p["fuse"] = _dexi_conv_init(ks, 1, 6, 1, dtype)
    return p


def _dexi_maxpool(x):
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)],
                 constant_values=-jnp.inf)
    return jax.lax.reduce_window(xp, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _dexi_dense_block(blk, x, skip):
    # published dense-layer padding quirk: conv1 pad=2, conv2 pad=0
    # (net same-size; NOT 1/1 — border pixels differ)
    for layer in blk:
        h = jax.nn.relu(x)
        h = L.conv2d(layer["conv1"], h, padding=[(2, 2), (2, 2)])
        h = jax.nn.relu(h)
        h = L.conv2d(layer["conv2"], h, padding="VALID")
        x = 0.5 * (h + skip)
    return x


def _dexi_up(stages, x, up_scale):
    for st in stages:
        x = L.conv2d(st["proj"], x)
        x = jax.nn.relu(x)
        k = st["deconv"]["w"].shape[0]
        x = L.conv_transpose2d(st["deconv"], x, stride=2,
                               padding=(k - 2) // 2, output_padding=0)
    return x


def dexined_apply(params: Params, images: jax.Array) -> jax.Array:
    """images [B,H,W,3] 0..1 -> soft edges [B,H,W,1] 0..1 (fused head,
    min/max normalised as the reference pipeline does)."""
    b, h, w, _ = images.shape
    x = images * 255.0
    b1 = jax.nn.relu(L.conv2d(params["block1"][0], x, stride=2,
                              padding=[(1, 1), (1, 1)]))
    b1 = L.conv2d(params["block1"][1], b1)
    b1 = jax.nn.relu(b1)
    b1_side = L.conv2d(params["side"][0], b1, stride=2)

    b2 = jax.nn.relu(L.conv2d(params["block2"][0], b1))
    b2 = L.conv2d(params["block2"][1], b2)
    b2_down = _dexi_maxpool(b2)
    b2_add = b2_down + b1_side
    b2_side = L.conv2d(params["side"][1], b2_add, stride=2)

    b3_pre = L.conv2d(params["pre"]["3"], b2_down)
    b3 = _dexi_dense_block(params["dense"][0], b2_add, b3_pre)
    b3_down = _dexi_maxpool(b3)
    b3_add = b3_down + b2_side
    b3_side = L.conv2d(params["side"][2], b3_add, stride=2)

    b2_half = L.conv2d(params["pre"]["2"], b2_down, stride=2)
    b4_pre = L.conv2d(params["pre"]["4"], b3_down + b2_half)
    b4 = _dexi_dense_block(params["dense"][1], b3_add, b4_pre)
    b4_down = _dexi_maxpool(b4)
    b4_add = b4_down + b3_side
    b4_side = L.conv2d(params["side"][3], b4_add)

    b5_pre = L.conv2d(params["pre"]["5"], b4_down)
    b5 = _dexi_dense_block(params["dense"][2], b4_add, b5_pre)
    b5 = b5 + b4_side

    b6_pre = L.conv2d(params["pre"]["6"], b5)
    b6 = _dexi_dense_block(params["dense"][3], b5, b6_pre)

    blocks = [b1, b2, b3, b4, b5, b6]
    scales = (1, 1, 2, 3, 4, 4)
    sides = []
    for blk, stages, sc in zip(blocks, params["up"], scales):
        o = _dexi_up(stages, blk, sc)
        if o.shape[1] != h or o.shape[2] != w:
            o = jax.image.resize(o, (b, h, w, 1), "bilinear")
        sides.append(o)
    fused = L.conv2d(params["fuse"], jnp.concatenate(sides, axis=-1))
    e = jax.nn.sigmoid(fused)
    lo = jnp.min(e, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(e, axis=(1, 2, 3), keepdims=True)
    return (e - lo) / jnp.maximum(hi - lo, 1e-6)


def _fold_bn(w, b, gamma, beta, rm, rv, eps=1e-5):
    """Fold inference BatchNorm into the preceding conv (HWIO w)."""
    s = gamma / np.sqrt(rv + eps)
    return w * s[None, None, None, :], (b - rm) * s + beta


def load_dexined_params(state: dict, dtype=None) -> Params:
    """DexiNed checkpoint (original-repo/kornia module naming:
    block_1.conv1..., dblock_3.denselayer1.conv1, side_1.conv,
    pre_dense_3.conv, up_block_1.features.N, block_cat.conv) -> our tree
    with BatchNorms folded into the convs. Falls back (KeyError) when the
    naming doesn't match, letting the engine random-init."""

    def conv_bn(cpre, bnpre=None):
        w = np.transpose(np.asarray(state[f"{cpre}.weight"]), (2, 3, 1, 0))
        b = np.asarray(state.get(f"{cpre}.bias", np.zeros(w.shape[-1])))
        if bnpre is not None and f"{bnpre}.weight" in state:
            w, b = _fold_bn(w, b,
                            np.asarray(state[f"{bnpre}.weight"]),
                            np.asarray(state[f"{bnpre}.bias"]),
                            np.asarray(state[f"{bnpre}.running_mean"]),
                            np.asarray(state[f"{bnpre}.running_var"]))
        return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)}

    def convT(cpre):
        w = np.transpose(np.asarray(state[f"{cpre}.weight"]), (2, 3, 0, 1))
        p = {"w": jnp.asarray(w, dtype)}
        if f"{cpre}.bias" in state:
            p["b"] = jnp.asarray(np.asarray(state[f"{cpre}.bias"]), dtype)
        return p

    p: Params = {
        "block1": [conv_bn("block_1.conv1", "block_1.bn1"),
                   conv_bn("block_1.conv2", "block_1.bn2")],
        "block2": [conv_bn("block_2.conv1", "block_2.bn1"),
                   conv_bn("block_2.conv2", "block_2.bn2")],
        # the published model names its four side blocks 1/2/3/5 —
        # there is no side_4 in the checkpoint
        "side": [conv_bn(f"side_{i}.conv", f"side_{i}.bn")
                 for i in (1, 2, 3, 5)],
        "pre": {str(i): conv_bn(f"pre_dense_{i}.conv", f"pre_dense_{i}.bn")
                for i in (2, 3, 4, 5, 6)},
        "dense": [], "up": [],
    }
    for bi, (n_layers, _, _) in zip((3, 4, 5, 6), _DEXI_DENSE):
        blk = []
        for li in range(1, n_layers + 1):
            pre = f"dblock_{bi}.denselayer{li}"
            blk.append({"conv1": conv_bn(f"{pre}.conv1", f"{pre}.norm1"),
                        "conv2": conv_bn(f"{pre}.conv2", f"{pre}.norm2")})
        p["dense"].append(blk)
    for ui, up_scale in zip(range(1, 7), (1, 1, 2, 3, 4, 4)):
        stages = []
        for i in range(up_scale):
            base = f"up_block_{ui}.features.{i * 3}"
            dec = f"up_block_{ui}.features.{i * 3 + 2}"
            stages.append({"proj": conv_bn(base), "deconv": convT(dec)})
        p["up"].append(stages)
    p["fuse"] = conv_bn("block_cat.conv", "block_cat.bn")
    return p
