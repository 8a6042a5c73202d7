"""M-LSD line-segment detector (MobileV2_MLSD_Large), TPU-native.

The reference vendors the torch MobileV2_MLSD_Large unmodified
(gyre/pipeline/hinters/models/mbv2_mlsd_large.py:1-314, Apache-2.0 from
lhwcv/mlsd_pytorch) and its config points the hinter at the published
``mlsd_large_512_fp32.pth`` checkpoint. This is a from-scratch NHWC
redesign of the same published architecture:

  * MobileNetV2 backbone (first 14 feature blocks), FPN taps after
    features 1/3/6/10/13, decoder BlockTypeA/B/C stack, 16-channel
    head — sliced to the 9 channels the decoder uses (center heat +
    4-vector endpoint displacements + 4 aux maps).
  * Inference-only: every BatchNorm is folded into its conv at load
    time, so apply() is convs + relu6 end to end.
  * TFLite padding quirk kept exact: stride-2 convs pad (0,1)x(0,1)
    asymmetrically (torch ref pads F.pad(0,1,0,1) then convs VALID).
  * BlockTypeA upsamples with bilinear align_corners=True — done here
    with an explicit gather interpolation (jax.image.resize is
    half-pixel, which differs).
  * Decode is fully vectorized in-graph (the torch reference decodes
    with a numpy/cv2 loop per image): sigmoid center heat -> 5x5
    max-pool NMS -> static top_k -> displacement gather -> score +
    length thresholds -> distance-to-segment rasterizer scanned in
    chunks over detections (bounded VMEM, static shapes).

Checkpoint layout consumed by load_mlsd (100% key accounting, BN
buffers folded):
  backbone.features.0.{0,1}.*            stem conv + BN
  backbone.features.N.conv.*             inverted residuals (t=1: dw
                                         conv.0.0/BN conv.0.1, proj
                                         conv.1/BN conv.2; t=6: expand
                                         conv.0.0/BN, dw conv.1.0/BN,
                                         proj conv.2/BN conv.3)
  block{15,17,19,21}.conv{1,2}.{0,1}.*   BlockTypeA 1x1 convs + BN
  block{16,18,20,22}.conv{1,2}.{0,1}.*   BlockTypeB 3x3 convs + BN
  block23.conv{1,2}.{0,1}.*, block23.conv3.{weight,bias}  BlockTypeC
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L

Params = dict

# MobileNetV2 inverted-residual plan (t, c, n, s) for the trimmed
# backbone: the published net stops after the 96-channel stage.
_IR_PLAN = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
            (6, 64, 4, 2), (6, 96, 3, 1))
# FPN taps, as indices into the flat block list (features[i] for
# i in 1,3,6,10,13 -> blocks[0,2,5,9,12]).
_FPN_BLOCKS = (0, 2, 5, 9, 12)

INPUT_SIZE = 512  # published checkpoint's training/serving resolution


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _upsample_bilinear_ac(x: jax.Array, factor: int = 2) -> jax.Array:
    """Bilinear 2x upsample with align_corners=True semantics
    (torch F.interpolate(..., align_corners=True); jax.image.resize is
    half-pixel so it can't be used for parity)."""
    b, h, w, c = x.shape
    hh, ww = h * factor, w * factor

    def _axis(n_in, n_out):
        pos = jnp.linspace(0.0, n_in - 1.0, n_out)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        frac = (pos - lo).astype(x.dtype)
        return lo, hi, frac

    y0, y1, fy = _axis(h, hh)
    x0, x1, fx = _axis(w, ww)
    xy = x[:, y0] * (1.0 - fy)[None, :, None, None] \
        + x[:, y1] * fy[None, :, None, None]
    return xy[:, :, x0] * (1.0 - fx)[None, None, :, None] \
        + xy[:, :, x1] * fx[None, None, :, None]


# ------------------------------------------------------------------ apply


def _stride2(p, x):
    """TFLite-padded stride-2 conv: pad (0,1)x(0,1), conv VALID."""
    groups = x.shape[-1] // p["w"].shape[2]
    return L.conv2d(p, x, stride=2, padding=[(0, 1), (0, 1)],
                    feature_group_count=groups)


def _ir_block(blk, x):
    h = x
    if "expand" in blk:
        h = relu6(L.conv2d(blk["expand"], h))
    dw = blk["dw"]
    groups = h.shape[-1]
    if blk["stride"] == 2:
        h = relu6(L.conv2d(dw, h, stride=2, padding=[(0, 1), (0, 1)],
                           feature_group_count=groups))
    else:
        h = relu6(L.conv2d(dw, h, feature_group_count=groups))
    h = L.conv2d(blk["proj"], h)
    return x + h if blk["res"] else h


def _block_a(p, a, b, upscale=True):
    b = jax.nn.relu(L.conv2d(p["conv1"], b))
    a = jax.nn.relu(L.conv2d(p["conv2"], a))
    if upscale:
        b = _upsample_bilinear_ac(b, 2)
    return jnp.concatenate([a, b], axis=-1)


def _block_b(p, x):
    x = jax.nn.relu(L.conv2d(p["conv1"], x)) + x
    return jax.nn.relu(L.conv2d(p["conv2"], x))


def _block_c(p, x):
    x = jax.nn.relu(L.conv2d(p["conv1"], x, padding=[(5, 5), (5, 5)],
                             dilation=5))
    x = jax.nn.relu(L.conv2d(p["conv2"], x))
    return L.conv2d(p["conv3"], x)


def backbone_fpn(params: Params, x: jax.Array) -> jax.Array:
    """x [B,H,W,4] (RGB*2-1 + ones channel) -> tpMap [B,H/2,W/2,16]."""
    f = relu6(_stride2(params["stem"], x))
    taps = []
    for i, blk in enumerate(params["blocks"]):
        f = _ir_block(blk, f)
        if i in _FPN_BLOCKS:
            taps.append(f)
    c1, c2, c3, c4, c5 = taps
    h = _block_a(params["a15"], c4, c5, upscale=False)
    h = _block_b(params["b16"], h)
    h = _block_a(params["a17"], c3, h)
    h = _block_b(params["b18"], h)
    h = _block_a(params["a19"], c2, h)
    h = _block_b(params["b20"], h)
    h = _block_a(params["a21"], c1, h)
    h = _block_b(params["b22"], h)
    return _block_c(params["c23"], h)


def _nms_heat(center: jax.Array, ksize: int = 3) -> jax.Array:
    """sigmoid + same max-pool NMS (keep local maxima only); the
    annotator decodes with ksize=3."""
    heat = jax.nn.sigmoid(center)
    pad = (ksize - 1) // 2
    hp = jnp.pad(heat, [(0, 0), (pad, pad), (pad, pad)],
                 constant_values=-jnp.inf)
    hmax = jax.lax.reduce_window(hp, -jnp.inf, jax.lax.max,
                                 (1, ksize, ksize), (1, 1, 1), "VALID")
    return jnp.where(hmax == heat, heat, 0.0)


def detect(params: Params, images: jax.Array, top_k: int = 200,
           score_thr: float = 0.10, dist_thr: float = 0.10,
           input_size: int = INPUT_SIZE):
    """images [B,H,W,3] in 0..1 -> (segments [B,K,4] normalized
    (x1,y1,x2,y2), valid [B,K] 0/1, scores [B,K]).

    Matches the published decode: center channel 7, displacement
    channels 8..11 of the 16-channel head; thresholds are the
    annotator defaults (score 0.1, segment length 0.1 px on the
    half-res grid)."""
    b = images.shape[0]
    x = jax.image.resize(images, (b, input_size, input_size, 3),
                         "bilinear")
    x = x * 2.0 - 1.0
    x = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
    tp = backbone_fpn(params, x)                       # [B,256,256,16]
    gh, gw = tp.shape[1], tp.shape[2]
    heat = _nms_heat(tp[..., 7])                       # [B,gh,gw]
    disp = tp[..., 8:12]                               # [B,gh,gw,4]
    scores, idx = jax.lax.top_k(heat.reshape(b, gh * gw), top_k)
    yy = (idx // gw).astype(jnp.float32)               # [B,K]
    xx = (idx % gw).astype(jnp.float32)
    d = jnp.take_along_axis(disp.reshape(b, gh * gw, 4),
                            idx[..., None], axis=1)    # [B,K,4]
    x1 = xx + d[..., 0]
    y1 = yy + d[..., 1]
    x2 = xx + d[..., 2]
    y2 = yy + d[..., 3]
    length = jnp.sqrt((x2 - x1) ** 2 + (y2 - y1) ** 2)
    valid = ((scores > score_thr) & (length > dist_thr)
             ).astype(jnp.float32)
    # the annotator maps half-res coords to full res by x*2*(w/512),
    # i.e. normalized = x/gw
    segs = jnp.stack([x1 / gw, y1 / gh, x2 / gw, y2 / gh], axis=-1)
    return jnp.clip(segs, 0.0, 1.0), valid, scores


def render_segments(segments: jax.Array, valid: jax.Array, height: int,
                    width: int, chunk: int = 25) -> jax.Array:
    """[B,K,4] normalized + [B,K] 0/1 -> white-on-black [B,H,W,1].

    Distance-to-segment rasterizer, scanned in chunks over K so the
    [B,chunk,H,W] intermediate stays VMEM/HBM-bounded (the torch
    reference draws per-line with cv2 on host)."""
    b, k, _ = segments.shape
    if k % chunk:
        pad = chunk - k % chunk
        segments = jnp.pad(segments, [(0, 0), (0, pad), (0, 0)])
        valid = jnp.pad(valid, [(0, 0), (0, pad)])
        k += pad
    half_w = 1.0 / max(height, width)   # ~1px stroke at render size
    yy = jnp.linspace(0.0, 1.0, height)[None, None, :, None]
    xx = jnp.linspace(0.0, 1.0, width)[None, None, None, :]
    segs_c = segments.reshape(b, k // chunk, chunk, 4
                              ).transpose(1, 0, 2, 3)
    ok_c = valid.reshape(b, k // chunk, chunk).transpose(1, 0, 2)

    def body(acc, sv):
        seg, ok = sv
        x1 = seg[..., 0][..., None, None]
        y1 = seg[..., 1][..., None, None]
        x2 = seg[..., 2][..., None, None]
        y2 = seg[..., 3][..., None, None]
        dx, dy = x2 - x1, y2 - y1
        len2 = jnp.maximum(dx * dx + dy * dy, 1e-8)
        t = jnp.clip(((xx - x1) * dx + (yy - y1) * dy) / len2, 0.0, 1.0)
        dist2 = (xx - x1 - t * dx) ** 2 + (yy - y1 - t * dy) ** 2
        hit = ((dist2 < half_w * half_w).astype(jnp.float32)
               * ok[..., None, None]).max(axis=1)
        return jnp.maximum(acc, hit), None

    acc0 = jnp.zeros((b, height, width), jnp.float32)
    mask, _ = jax.lax.scan(body, acc0, (segs_c, ok_c))
    return mask[..., None]


def apply(params: Params, images: jax.Array, top_k: int = 200,
          score_thr: float = 0.10, dist_thr: float = 0.10,
          input_size: int = INPUT_SIZE) -> jax.Array:
    """images [B,H,W,3] 0..1 -> line map [B,H,W,3] (white lines on
    black, the annotator's render contract)."""
    segs, valid, _ = detect(params, images, top_k, score_thr, dist_thr,
                            input_size)
    lines = render_segments(segs, valid, images.shape[1],
                            images.shape[2])
    return jnp.tile(lines, (1, 1, 1, 3))


# ------------------------------------------------------------------- init


def _conv_p(ks, kh, kw, c_in, c_out, dtype):
    return L.conv_init(next(ks), kh, kw, c_in, c_out, dtype)


def init(key, dtype=jnp.float32) -> Params:
    """Random init with the real topology (BNs folded -> identity);
    used by weightless test presets."""
    ks = iter(jax.random.split(key, 256))
    p: Params = {"stem": _conv_p(ks, 3, 3, 4, 32, dtype), "blocks": []}
    c_prev = 32
    for t, c, n, s in _IR_PLAN:
        for i in range(n):
            stride = s if i == 0 else 1
            hidden = c_prev * t
            blk = {"stride": stride, "res": stride == 1 and c_prev == c}
            if t != 1:
                blk["expand"] = _conv_p(ks, 1, 1, c_prev, hidden, dtype)
            blk["dw"] = _conv_p(ks, 3, 3, 1, hidden, dtype)
            blk["proj"] = _conv_p(ks, 1, 1, hidden, c, dtype)
            p["blocks"].append(blk)
            c_prev = c
    for name, ci1, ci2 in (("a15", 64, 96), ("a17", 32, 64),
                           ("a19", 24, 64), ("a21", 16, 64)):
        p[name] = {"conv1": _conv_p(ks, 1, 1, ci2, 64, dtype),
                   "conv2": _conv_p(ks, 1, 1, ci1, 64, dtype)}
    for name in ("b16", "b18", "b20", "b22"):
        p[name] = {"conv1": _conv_p(ks, 3, 3, 128, 128, dtype),
                   "conv2": _conv_p(ks, 3, 3, 128, 64, dtype)}
    p["c23"] = {"conv1": _conv_p(ks, 3, 3, 64, 64, dtype),
                "conv2": _conv_p(ks, 3, 3, 64, 64, dtype),
                "conv3": _conv_p(ks, 1, 1, 64, 16, dtype)}
    return p


# ------------------------------------------------------------------- load


def _fold(w, b, gamma, beta, rm, rv, eps=1e-5):
    s = gamma / np.sqrt(rv + eps)
    return w * s[None, None, None, :], (b - rm) * s + beta


def load_mlsd(state: dict, dtype=None) -> Params:
    """mlsd_large_512_fp32.pth state dict -> params, BNs folded.
    Strict: every key consumed (BN num_batches_tracked ignored)."""
    used = set()

    def raw(k):
        used.add(k)
        return np.asarray(state[k], np.float32)

    def conv_bn(cpre, bnpre, depthwise=False):
        w = raw(f"{cpre}.weight")
        if depthwise:                      # [C,1,kh,kw] -> [kh,kw,1,C]
            w = np.transpose(w, (2, 3, 1, 0))
        else:                              # [O,I,kh,kw] -> [kh,kw,I,O]
            w = np.transpose(w, (2, 3, 1, 0))
        b = raw(f"{cpre}.bias") if f"{cpre}.bias" in state \
            else np.zeros(w.shape[-1], np.float32)
        if bnpre is not None:
            w, b = _fold(w, b, raw(f"{bnpre}.weight"),
                         raw(f"{bnpre}.bias"),
                         raw(f"{bnpre}.running_mean"),
                         raw(f"{bnpre}.running_var"))
        return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)}

    p: Params = {"stem": conv_bn("backbone.features.0.0",
                                 "backbone.features.0.1"),
                 "blocks": []}
    fi = 1
    c_prev = 32
    for t, c, n, s in _IR_PLAN:
        for i in range(n):
            stride = s if i == 0 else 1
            pre = f"backbone.features.{fi}.conv"
            blk = {"stride": stride, "res": stride == 1 and c_prev == c}
            if t == 1:
                blk["dw"] = conv_bn(f"{pre}.0.0", f"{pre}.0.1",
                                    depthwise=True)
                blk["proj"] = conv_bn(f"{pre}.1", f"{pre}.2")
            else:
                blk["expand"] = conv_bn(f"{pre}.0.0", f"{pre}.0.1")
                blk["dw"] = conv_bn(f"{pre}.1.0", f"{pre}.1.1",
                                    depthwise=True)
                blk["proj"] = conv_bn(f"{pre}.2", f"{pre}.3")
            p["blocks"].append(blk)
            c_prev = c
            fi += 1
    for name, idx in (("a15", 15), ("a17", 17), ("a19", 19),
                      ("a21", 21)):
        p[name] = {"conv1": conv_bn(f"block{idx}.conv1.0",
                                    f"block{idx}.conv1.1"),
                   "conv2": conv_bn(f"block{idx}.conv2.0",
                                    f"block{idx}.conv2.1")}
    for name, idx in (("b16", 16), ("b18", 18), ("b20", 20),
                      ("b22", 22)):
        p[name] = {"conv1": conv_bn(f"block{idx}.conv1.0",
                                    f"block{idx}.conv1.1"),
                   "conv2": conv_bn(f"block{idx}.conv2.0",
                                    f"block{idx}.conv2.1")}
    p["c23"] = {"conv1": conv_bn("block23.conv1.0", "block23.conv1.1"),
                "conv2": conv_bn("block23.conv2.0", "block23.conv2.1"),
                "conv3": conv_bn("block23.conv3", None)}
    left = [k for k in state if k not in used
            and not k.endswith("num_batches_tracked")]
    if left:
        raise KeyError(f"unconsumed M-LSD checkpoint keys: {left[:8]}"
                       f"{'...' if len(left) > 8 else ''}")
    return p
