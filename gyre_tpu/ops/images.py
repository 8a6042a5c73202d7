"""Tensor-first image ops library (the reference's gyre/images.py:28-667
surface, re-built for JAX/NHWC).

Convention: images are [B,H,W,C] float32 in [0,1] (the reference uses BCHW;
NHWC is the TPU-native layout and conversion happens only at the PNG/proto
boundary). Everything here is jit-safe and differentiable unless noted.
"""

from __future__ import annotations

import io
import struct
import zlib

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ------------------------------------------------------------------ PNG IO


def decode_png(data: bytes) -> np.ndarray:
    """bytes -> [1,H,W,C] float32 0..1 (C = 1/3/4). Uses PIL."""
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    arr = np.asarray(img).astype(np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr[None]


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib as _zlib

    return (struct.pack(">I", len(data)) + tag + data +
            struct.pack(">I", _zlib.crc32(tag + data)))


def _png_text_chunks(metadata: dict[str, str]) -> bytes:
    """tEXt for latin-1 payloads, iTXt (UTF-8) otherwise — the same
    split PIL's PngInfo.add_text makes, so png_metadata/PIL read both."""
    out = b""
    for k, v in metadata.items():
        key = str(k)[:79].encode("latin-1", "replace")
        try:
            out += _png_chunk(b"tEXt", key + b"\0" +
                              str(v).encode("latin-1"))
        except UnicodeEncodeError:
            out += _png_chunk(b"iTXt", key + b"\0\0\0\0\0" +
                              str(v).encode("utf-8"))
    return out


def encode_png(img: np.ndarray, metadata: dict[str, str] | None = None,
               compress_level: int = 1) -> bytes:
    """[H,W,C] or [1,H,W,C] float 0..1 (or uint8) -> PNG bytes, with
    optional tEXt/iTXt metadata chunks (the reference embeds full request
    params this way, gyre/services/generate.py:1093-1135).

    Direct encoder: filter-0 scanlines + one zlib stream. PNG encode is
    serialized host work on the serving path (this host serves from ONE
    CPU core: 8 coalesced clients' encodes ran 713 ms p50 each,
    scripts/profile_serving.py round 5), and PIL's adaptive row filters
    cost more than they save at generated-image statistics: measured
    42 ms vs PIL-level-3's 94 ms per 512x512, with SMALLER output
    (558 vs 584 KB). compress_level is the zlib level (0 = stored,
    ~2 ms/image for 787 KB — the intra-datacenter tradeoff)."""
    if img.ndim == 4:
        img = img[0]
    arr = np.ascontiguousarray(img)
    if arr.dtype != np.uint8:   # device-side quantized outputs pass through
        arr = (np.clip(arr, 0, 1) * 255).round().astype(np.uint8)
    import struct
    import zlib as _zlib

    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(c)
    if color_type is None:  # exotic channel count: PIL fallback
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG",
                                  compress_level=max(compress_level, 1))
        return buf.getvalue()
    raw = np.empty((h, 1 + w * c), np.uint8)
    raw[:, 0] = 0               # filter type 0 (None) per scanline
    raw[:, 1:] = arr.reshape(h, w * c)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_text_chunks(metadata or {})
            + _png_chunk(b"IDAT", _zlib.compress(raw.tobytes(),
                                                 compress_level))
            + _png_chunk(b"IEND", b""))


def encode_webp(img: np.ndarray, quality: int = 90) -> bytes:
    from PIL import Image

    if img.ndim == 4:
        img = img[0]
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).round().astype(np.uint8)
    pil = Image.fromarray(arr)
    buf = io.BytesIO()
    pil.save(buf, format="WEBP", quality=quality)
    return buf.getvalue()


def png_metadata(data: bytes) -> dict[str, str]:
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    return dict(img.text) if hasattr(img, "text") else {}


# -------------------------------------------------------------- adjustments


def normalise(img, r_from=0.0, r_to=1.0):
    lo = jnp.min(img, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(img, axis=(1, 2, 3), keepdims=True)
    x = (img - lo) / jnp.maximum(hi - lo, 1e-8)
    return x * (r_to - r_from) + r_from


def levels(img, in_low=0.0, in_high=1.0, out_low=0.0, out_high=1.0):
    x = (img - in_low) / max(in_high - in_low, 1e-8)
    x = jnp.clip(x, 0.0, 1.0)
    return x * (out_high - out_low) + out_low


def invert(img):
    return 1.0 - img


CHANNEL_INDEX = {"r": 0, "g": 1, "b": 2, "a": 3}


def channelmap(img, src: str, dst: str):
    """Copy channel src into dst ('r','g','b','a','zero','one')."""
    c = img.shape[-1]
    if src == "zero":
        col = jnp.zeros_like(img[..., :1])
    elif src == "one":
        col = jnp.ones_like(img[..., :1])
    else:
        col = img[..., CHANNEL_INDEX[src]:CHANNEL_INDEX[src] + 1]
    d = CHANNEL_INDEX[dst]
    if d >= c:
        pad = jnp.ones_like(img[..., :1])
        img = jnp.concatenate([img] + [pad] * (d + 1 - c), axis=-1)
    return img.at[..., d:d + 1].set(col)


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / max(sigma, 1e-8)) ** 2)
    return (k / k.sum()).astype(np.float32)


def _depthwise_1d(x, kernel, axis, channels):
    """Depthwise 1D conv along H (axis=1) or W (axis=2), VALID padding."""
    if axis == 1:
        kern = kernel.reshape(-1, 1, 1, 1)
    else:
        kern = kernel.reshape(1, -1, 1, 1)
    kern = jnp.tile(kern, (1, 1, 1, channels))  # HWIO with I=1, grouped
    return lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels)


def gaussian_blur(img, sigma: float):
    """Separable gaussian blur, edge-replicated."""
    radius = max(1, int(3 * sigma + 0.5))
    k = jnp.asarray(_gaussian_kernel1d(sigma, radius))
    c = img.shape[-1]
    x = jnp.pad(img, [(0, 0), (radius, radius), (0, 0), (0, 0)], mode="edge")
    x = _depthwise_1d(x, k, 1, c)
    x = jnp.pad(x, [(0, 0), (0, 0), (radius, radius), (0, 0)], mode="edge")
    return _depthwise_1d(x, k, 2, c)


def directionalblur(img, sigma: float, direction: str = "up"):
    """One-sided vertical blur (the reference's mask-feathering op,
    gyre/images.py directionalblur; default mask postAdjustment uses
    direction=up sigma=32, gyre/services/generate.py:35-49)."""
    radius = max(1, int(3 * sigma + 0.5))
    k = _gaussian_kernel1d(sigma, radius)
    if direction == "up":
        k[:radius] = 0.0  # only pull from below? one-sided kernel
    else:
        k[radius + 1:] = 0.0
    k = k / k.sum()
    c = img.shape[-1]
    x = jnp.pad(img, [(0, 0), (radius, radius), (0, 0), (0, 0)], mode="edge")
    out = _depthwise_1d(x, jnp.asarray(k), 1, c)
    return jnp.maximum(out, img) if direction == "up" else out


def rescale(img, height: int, width: int, fit: str = "cover",
            method: str = "lanczos3"):
    """Resize with fit modes strict/cover/contain (reference
    gyre/images.py:316-410, ResizeRight lanczos semantics via
    jax.image.resize lanczos3/5)."""
    b, h, w, c = img.shape
    if fit == "strict":
        return jax.image.resize(img, (b, height, width, c), method)
    scale = max(height / h, width / w) if fit == "cover" else \
        min(height / h, width / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    out = jax.image.resize(img, (b, nh, nw, c), method)
    if fit == "cover":
        top = (nh - height) // 2
        left = (nw - width) // 2
        return out[:, top:top + height, left:left + width]
    # contain: pad with edge replicate
    pt = (height - nh) // 2
    pl = (width - nw) // 2
    return jnp.pad(out, [(0, 0), (pt, height - nh - pt),
                         (pl, width - nw - pl), (0, 0)], mode="edge")


def crop(img, top: int, left: int, height: int, width: int):
    return img[:, top:top + height, left:left + width]


def autoscale(img, height: int, width: int, mode: str = "lanczos3"):
    return rescale(img, height, width, fit="cover", method=mode)


# ------------------------------------------------------------- edge / depth


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = _SOBEL_X.T


def _conv3(img1, kernel):
    k = jnp.asarray(kernel).reshape(3, 3, 1, 1)
    x = jnp.pad(img1, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
    return lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def to_grayscale(img):
    if img.shape[-1] == 1:
        return img
    w = jnp.asarray([0.299, 0.587, 0.114])
    return jnp.sum(img[..., :3] * w, axis=-1, keepdims=True)


def sobel_edges(img):
    g = to_grayscale(img)
    gx = _conv3(g, _SOBEL_X)
    gy = _conv3(g, _SOBEL_Y)
    return jnp.sqrt(gx ** 2 + gy ** 2), jnp.arctan2(gy, gx)


def canny_edge(img, low: float = 0.1, high: float = 0.2):
    """Differentiable-ish canny: blur -> sobel -> NMS -> double threshold
    (hysteresis approximated by dilation of strong edges)."""
    g = gaussian_blur(to_grayscale(img), 1.4)
    mag, theta = sobel_edges(g)
    # quantize direction to 4 bins and do non-max suppression via shifts
    ang = (theta % np.pi) / np.pi * 4.0
    shifts = [
        ((0, 1), (0, -1)),    # 0 deg: left/right
        ((-1, 1), (1, -1)),   # 45
        ((1, 0), (-1, 0)),    # 90: up/down
        ((1, 1), (-1, -1)),   # 135
    ]
    nms = mag
    keep = jnp.zeros_like(mag, bool)
    for b, ((dy1, dx1), (dy2, dx2)) in enumerate(shifts):
        n1 = jnp.roll(mag, (dy1, dx1), axis=(1, 2))
        n2 = jnp.roll(mag, (dy2, dx2), axis=(1, 2))
        in_bin = (ang >= b) & (ang < b + 1)
        keep = keep | (in_bin & (mag >= n1) & (mag >= n2))
    nms = jnp.where(keep, mag, 0.0)
    strong = nms > high
    weak = nms > low
    # one-step hysteresis: weak pixels next to strong survive
    dil = lax.reduce_window(strong.astype(jnp.float32), 0.0, lax.max,
                            (1, 3, 3, 1), (1, 1, 1, 1), "SAME") > 0
    return (strong | (weak & dil)).astype(jnp.float32)


def normalmap_from_depthmap(depth, background_threshold: float = 0.05):
    """Depth [B,H,W,1] -> normal map [B,H,W,3] in 0..1 (reference
    gyre/images.py:471-542: spatial gradient -> normals, background
    masked)."""
    d = to_grayscale(depth)
    gx = _conv3(d, _SOBEL_X)
    gy = _conv3(d, _SOBEL_Y)
    z = jnp.ones_like(gx) * 2.0 / d.shape[1]
    n = jnp.concatenate([-gx, -gy, z], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    bg = d < background_threshold
    n = jnp.where(bg, jnp.asarray([0.0, 0.0, 1.0]), n)
    return n * 0.5 + 0.5


# --------------------------------------------------------- quantize / misc


def palletize(img, colors: int = 16):
    """Reduce each channel to `colors` uniform levels."""
    q = float(colors - 1)
    return jnp.round(img * q) / q


def quantize(img, threshold: float = 0.5):
    return (img > threshold).astype(img.dtype)


def shuffle(img, key, tile: int = 64):
    """Content-shuffle op (ControlNet-shuffle style): random smooth warp."""
    b, h, w, c = img.shape
    k1, k2 = jax.random.split(key)
    flow = jax.random.normal(k1, (b, h // tile + 1, w // tile + 1, 2))
    flow = jax.image.resize(flow, (b, h, w, 2), "bicubic") * (tile / 2.0)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    sy = jnp.clip(yy + flow[..., 0], 0, h - 1).astype(jnp.int32)
    sx = jnp.clip(xx + flow[..., 1], 0, w - 1).astype(jnp.int32)
    bidx = jnp.arange(b)[:, None, None]
    return img[bidx, sy, sx]


def infill(img, mask_keep, iterations: int = 16):
    """Push-pull style infill of masked regions by repeated masked blur
    (reference gyre/images.py:638-666)."""
    out = img * mask_keep
    alpha = mask_keep
    for _ in range(iterations):
        out_b = gaussian_blur(out, 2.0)
        alpha_b = gaussian_blur(alpha, 2.0)
        fill = out_b / jnp.maximum(alpha_b, 1e-6)
        out = jnp.where(alpha > 0.5, out, fill * (alpha_b > 1e-4))
        alpha = jnp.maximum(alpha, (alpha_b > 1e-4).astype(alpha.dtype))
    return jnp.where(mask_keep > 0.5, img, out)


# ----------------------------------------------------- histogram matching


def match_histograms(source, reference, mask=None):
    """Match source's per-channel value distribution to reference's via
    sorted-value CDF mapping (reference gyre/match_histograms.py:12-94).
    Differentiable w.r.t. values (sort-based). [B,H,W,C] each."""
    b, h, w, c = source.shape
    n = h * w
    src = source.reshape(b, n, c)
    ref = reference.reshape(b, -1, c)
    src_sorted_idx = jnp.argsort(src, axis=1)
    ref_sorted = jnp.sort(ref, axis=1)
    # positions of each source pixel in its own sorted order
    ranks = jnp.argsort(src_sorted_idx, axis=1)
    # map rank -> reference quantile
    ref_n = ref_sorted.shape[1]
    q = (ranks.astype(jnp.float32) / max(n - 1, 1)) * (ref_n - 1)
    lo = jnp.floor(q).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, ref_n - 1)
    frac = q - lo.astype(jnp.float32)
    gather = lambda arr, idx: jnp.take_along_axis(arr, idx, axis=1)
    mapped = gather(ref_sorted, lo) * (1 - frac) + gather(ref_sorted, hi) * frac
    out = mapped.reshape(b, h, w, c)
    if mask is not None:
        out = out * mask + source * (1 - mask)
    return out


# ------------------------------------------------------ frequency blending


def frequency_blend(low_img, high_img, sigma: float = 4.0):
    """Take low frequencies from one image and high from another
    (reference gyre/images.py:543-577 outmask blending)."""
    low = gaussian_blur(low_img, sigma)
    high = high_img - gaussian_blur(high_img, sigma)
    return jnp.clip(low + high, 0.0, 1.0)


def _box_sum_1d(x, radius: int, axis: int):
    """Windowed sum over [i-r, i+r] with zero padding outside, via a
    cumulative sum (integral image) — O(1) per pixel, no conv."""
    n = x.shape[axis]
    c = jnp.cumsum(x, axis=axis)
    zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis))
    c = jnp.concatenate([zero, c], axis=axis)
    idx = np.arange(n)
    hi = np.clip(idx + radius + 1, 0, n)
    lo = np.clip(idx - radius, 0, n)
    return jnp.take(c, hi, axis=axis) - jnp.take(c, lo, axis=axis)


def box_sum(x, radius: int):
    """2D windowed sum over a (2r+1)^2 box, zero-padded — the reference's
    boxfilter2d (gyre/pipeline/hinters/models/boxfilter.py)."""
    return _box_sum_1d(_box_sum_1d(x, radius, 1), radius, 2)


def guided_filter(guide, src, radius: int = 32, eps: float = 1e-6):
    """He et al. guided filter: edge-aware refinement of `src` by an RGB
    or grayscale `guide`, both NHWC in 0..1.

    Reference semantics from guidedfilter2d_color/_gray
    (gyre/pipeline/hinters/models/guided_filter.py:41-176), restructured
    for TPU: integral-image box sums instead of conv, a batched 3x3
    linear solve instead of the hand-unrolled adjugate, and f32 instead
    of the reference's f64 (TPU has no f64 path) — so the default eps is
    1e-6 rather than 1e-8, below which f32 variance cancellation noise
    dominates.
    """
    guide = jnp.asarray(guide, jnp.float32)
    src = jnp.asarray(src, jnp.float32)
    gc = guide.shape[-1]
    ones = jnp.ones(guide.shape[:3] + (1,), jnp.float32)
    n = box_sum(ones, radius)

    def mean(x):
        return box_sum(x, radius) / n

    mean_i = mean(guide)                       # [B,H,W,G]
    mean_p = mean(src)                         # [B,H,W,C]
    if gc == 1:
        cov_ip = mean(guide * src) - mean_i * mean_p
        var_i = mean(guide * guide) - mean_i * mean_i
        a = cov_ip / (var_i + eps)             # [B,H,W,C]
        b = mean_p - a * mean_i
        return mean(a) * guide + mean(b)

    # color guide: per-pixel 3x3 covariance solve. Outer products are
    # flattened to trailing channels so the box sums stay 4-D NHWC.
    sc = src.shape[-1]
    bhw = guide.shape[:3]

    def mean_outer(x, y):
        prod = (x[..., :, None] * y[..., None, :]).reshape(
            bhw + (x.shape[-1] * y.shape[-1],))
        return mean(prod).reshape(bhw + (x.shape[-1], y.shape[-1]))

    corr_ip = mean_outer(guide, src)           # [B,H,W,3,C]
    cov_ip = corr_ip - mean_i[..., :, None] * mean_p[..., None, :]
    corr_ii = mean_outer(guide, guide)         # [B,H,W,3,3]
    sigma = corr_ii - mean_i[..., :, None] * mean_i[..., None, :]
    sigma = sigma + eps * jnp.eye(gc, dtype=jnp.float32)
    a = jnp.linalg.solve(sigma, cov_ip)        # [B,H,W,3,C]
    b = mean_p - jnp.einsum("bhwgc,bhwg->bhwc", a, mean_i)
    mean_a = mean(a.reshape(bhw + (gc * sc,))).reshape(a.shape)
    return (jnp.einsum("bhwgc,bhwg->bhwc", mean_a, guide) + mean(b))


def tv_denoise(img, weight: float = 0.1, iterations: int = 16):
    """Chambolle-style total-variation denoise (reference
    gyre/images.py:424-468)."""
    x = img
    for _ in range(iterations):
        dx = jnp.diff(x, axis=2, append=x[:, :, -1:])
        dy = jnp.diff(x, axis=1, append=x[:, -1:, :])
        norm = jnp.sqrt(dx ** 2 + dy ** 2 + 1e-8)
        div = dx / norm + dy / norm
        x = x + weight * 0.125 * div
    return jnp.clip(x, 0.0, 1.0)
