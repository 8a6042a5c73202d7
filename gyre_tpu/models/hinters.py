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


# ------------------------------------------------------------------- MLSD


def mlsd_init(key, widths=(16, 32, 64, 64), dtype=jnp.float32) -> Params:
    """MLSD-style line-segment detector: center heatmap + endpoint
    displacement vectors at stride 4 (reference vendors MLSD,
    gyre/pipeline/hinters/ ~314 LoC torch)."""
    ks = jax.random.split(key, 2)
    p = depth_init(ks[0], widths, dtype)
    dec_w = widths[0] * 2
    # head: [center, dx1, dy1, dx2, dy2]
    p["head2"] = L.conv_init(ks[1], 3, 3, dec_w // 2, 5, dtype)
    return p


def mlsd_detect(params: Params, images: jax.Array, top_k: int = 64):
    """-> (segments [B,K,4] in 0..1 coords (x1,y1,x2,y2), scores [B,K])."""
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
    tp = L.conv2d(params["head2"], out)                # [B,h/4,w/4,5]
    gh, gw = tp.shape[1], tp.shape[2]
    center = tp[..., 0].reshape(b, gh * gw)
    disp = tp[..., 1:].reshape(b, gh * gw, 4)
    scores, idx = jax.lax.top_k(center, top_k)          # [B,K]
    ys = (idx // gw).astype(jnp.float32) / max(gh - 1, 1)
    xs = (idx % gw).astype(jnp.float32) / max(gw - 1, 1)
    d = jnp.take_along_axis(disp, idx[..., None], axis=1)  # [B,K,4]
    d = jnp.tanh(d) * 0.25  # bounded displacements
    segs = jnp.stack([xs + d[..., 0], ys + d[..., 1],
                      xs + d[..., 2], ys + d[..., 3]], axis=-1)
    return jnp.clip(segs, 0.0, 1.0), jax.nn.sigmoid(scores)


def render_lines(segments: jax.Array, scores: jax.Array, height: int,
                 width: int, threshold: float = 0.5,
                 line_width: float = 0.006) -> jax.Array:
    """[B,K,4] + [B,K] -> white-on-black line map [B,H,W,1]."""
    b, k, _ = segments.shape
    yy = jnp.linspace(0, 1, height)[None, None, :, None]
    xx = jnp.linspace(0, 1, width)[None, None, None, :]
    x1 = segments[..., 0][..., None, None]
    y1 = segments[..., 1][..., None, None]
    x2 = segments[..., 2][..., None, None]
    y2 = segments[..., 3][..., None, None]
    dx, dy = x2 - x1, y2 - y1
    len2 = jnp.maximum(dx ** 2 + dy ** 2, 1e-8)
    t = jnp.clip(((xx - x1) * dx + (yy - y1) * dy) / len2, 0.0, 1.0)
    dist = jnp.sqrt((xx - x1 - t * dx) ** 2 + (yy - y1 - t * dy) ** 2)
    ok = (scores > threshold).astype(jnp.float32)[..., None, None]
    mask = ((dist < line_width).astype(jnp.float32) * ok).max(axis=1)
    return mask[..., None]


def mlsd_apply(params: Params, images: jax.Array) -> jax.Array:
    segs, scores = mlsd_detect(params, images)
    lines = render_lines(segs, scores, images.shape[1], images.shape[2])
    return jnp.tile(lines, (1, 1, 1, 3))


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
