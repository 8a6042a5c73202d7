"""Pose estimation + OpenPose-style skeleton rendering.

The reference runs mmpose with mmdet person detection and renders
keypose/openpose maps (gyre/pipeline/hinters/mmpose_pipeline.py, ~290 LoC
over vendored mmlab stacks). Here:

  * PoseNet — a CPM-shaped heatmap network: conv backbone at stride 8 +
    per-keypoint confidence maps (COCO-18 layout). Single-person argmax
    decoding (multi-person PAF grouping tracked for a later round).
  * render_openpose — the standard OpenPose skeleton rasterizer (colored
    limbs + joints) as pure jnp distance fields, so hint generation stays
    on-device and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L

Params = dict

N_KEYPOINTS = 18

# COCO-18 limb pairs and the canonical OpenPose limb colors
LIMBS = [(1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7), (1, 8), (8, 9),
         (9, 10), (1, 11), (11, 12), (12, 13), (1, 0), (0, 14), (14, 16),
         (0, 15), (15, 17)]
LIMB_COLORS = np.asarray([
    (255, 0, 0), (255, 85, 0), (255, 170, 0), (255, 255, 0),
    (170, 255, 0), (85, 255, 0), (0, 255, 0), (0, 255, 85),
    (0, 255, 170), (0, 255, 255), (0, 170, 255), (0, 85, 255),
    (0, 0, 255), (85, 0, 255), (170, 0, 255), (255, 0, 255),
    (255, 0, 170)], np.float32) / 255.0


def init(key, width: int = 64, n_blocks: int = 6,
         dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, n_blocks * 2 + 6))
    p: Params = {
        "stem1": L.conv_init(next(ks), 3, 3, 3, width, dtype),
        "stem2": L.conv_init(next(ks), 3, 3, width, width, dtype),
        "stem3": L.conv_init(next(ks), 3, 3, width, width * 2, dtype),
        "blocks": [],
        "head1": L.conv_init(next(ks), 1, 1, width * 2, width, dtype),
        "head2": L.conv_init(next(ks), 1, 1, width, N_KEYPOINTS, dtype),
    }
    for _ in range(n_blocks):
        p["blocks"].append({
            "conv1": L.conv_init(next(ks), 3, 3, width * 2, width * 2,
                                 dtype),
            "conv2": L.conv_init(next(ks), 3, 3, width * 2, width * 2,
                                 dtype),
            "norm": L.norm_init(width * 2, dtype),
        })
    return p


def heatmaps(params: Params, images: jax.Array) -> jax.Array:
    """images [B,H,W,3] 0..1 -> keypoint confidence maps [B,H/8,W/8,18]."""
    x = images * 2.0 - 1.0
    x = jax.nn.relu(L.conv2d(params["stem1"], x, stride=2,
                             padding=[(1, 1), (1, 1)]))
    x = jax.nn.relu(L.conv2d(params["stem2"], x, stride=2,
                             padding=[(1, 1), (1, 1)]))
    x = jax.nn.relu(L.conv2d(params["stem3"], x, stride=2,
                             padding=[(1, 1), (1, 1)]))
    for blk in params["blocks"]:
        h = jax.nn.relu(L.conv2d(blk["conv1"], x))
        h = L.conv2d(blk["conv2"], h)
        x = jax.nn.relu(L.group_norm(blk["norm"], x + h, 8))
    x = jax.nn.relu(L.conv2d(params["head1"], x))
    return L.conv2d(params["head2"], x)


def decode_keypoints(maps: jax.Array):
    """[B,h,w,K] -> (xy [B,K,2] in 0..1 coords, confidence [B,K])."""
    b, h, w, k = maps.shape
    flat = maps.reshape(b, h * w, k)
    idx = jnp.argmax(flat, axis=1)                      # [B,K]
    conf = jax.nn.sigmoid(jnp.max(flat, axis=1))
    ys = (idx // w).astype(jnp.float32) / max(h - 1, 1)
    xs = (idx % w).astype(jnp.float32) / max(w - 1, 1)
    return jnp.stack([xs, ys], axis=-1), conf


def render_openpose(keypoints: jax.Array, conf: jax.Array, height: int,
                    width: int, threshold: float = 0.3,
                    limb_width: float = 0.02) -> jax.Array:
    """keypoints [B,K,2] (0..1), conf [B,K] -> canvas [B,H,W,3]."""
    b = keypoints.shape[0]
    yy = jnp.linspace(0, 1, height)[None, :, None]
    xx = jnp.linspace(0, 1, width)[None, None, :]
    canvas = jnp.zeros((b, height, width, 3), jnp.float32)
    colors = jnp.asarray(LIMB_COLORS)
    for li, (a, bk) in enumerate(LIMBS):
        pa = keypoints[:, a]                             # [B,2]
        pb = keypoints[:, bk]
        ok = ((conf[:, a] > threshold) &
              (conf[:, bk] > threshold)).astype(jnp.float32)
        # distance from each pixel to segment pa-pb
        dx = pb[:, 0] - pa[:, 0]
        dy = pb[:, 1] - pa[:, 1]
        len2 = jnp.maximum(dx ** 2 + dy ** 2, 1e-8)
        px = xx - pa[:, 0][:, None, None]
        py = yy - pa[:, 1][:, None, None]
        t = jnp.clip((px * dx[:, None, None] + py * dy[:, None, None]) /
                     len2[:, None, None], 0.0, 1.0)
        ddx = px - t * dx[:, None, None]
        ddy = py - t * dy[:, None, None]
        dist = jnp.sqrt(ddx ** 2 + ddy ** 2)
        mask = (dist < limb_width).astype(jnp.float32) * \
            ok[:, None, None]
        canvas = jnp.maximum(canvas, mask[..., None] * colors[li])
    return canvas


def estimate_and_render(params: Params, images: jax.Array) -> jax.Array:
    """Full hinter pipeline: image -> openpose skeleton map."""
    maps = heatmaps(params, images)
    kps, conf = decode_keypoints(maps)
    return render_openpose(kps, conf, images.shape[1], images.shape[2])
