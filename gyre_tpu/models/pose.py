"""Pose estimation + OpenPose-style skeleton rendering.

The reference runs mmpose with mmdet person detection and renders
keypose/openpose maps (gyre/pipeline/hinters/mmpose_pipeline.py, ~290 LoC
over vendored mmlab stacks). Here:

  * PoseNet — a CPM-shaped heatmap network: conv backbone at stride 8 +
    per-keypoint confidence maps (COCO-18 layout) + part-affinity fields
    (2 channels per limb, the OpenPose PAF formulation).
  * Multi-person decoding, static shapes throughout: top-P spatial peaks
    per keypoint (3x3 NMS + top_k), limb candidates scored by the PAF
    line integral, mutual-best matching (a pair survives iff each endpoint
    is the other's argmax) — no data-dependent person assembly, because
    hint rendering only needs the limb set, not person identities.
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


# ----- keypose render style (T2I-Adapter keypose hint surface; reference
# render_keypose, gyre/pipeline/hinters/mmpose_pipeline.py:15-135: COCO-17
# mmpose joint order, fixed 3-color palette, thin cv2 circles+lines on
# black — visually distinct from the openpose limb render above).
# Index map from our openpose-18 joint order into mmpose COCO-17:
# nose, l/r eye, l/r ear, l/r shoulder, l/r elbow, l/r wrist, l/r hip,
# l/r knee, l/r ankle.
KEYPOSE_FROM_OPENPOSE = np.asarray(
    [0, 15, 14, 17, 16, 5, 2, 6, 3, 7, 4, 11, 8, 12, 9, 13, 10], np.int32)
KEYPOSE_SKELETON = [
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6)]
_KP_BLUE, _KP_GREEN, _KP_ORANGE = ((51, 153, 255), (0, 255, 0),
                                   (255, 128, 0))
KEYPOSE_KPT_COLORS = np.asarray(
    [_KP_BLUE] * 5 + [_KP_GREEN, _KP_ORANGE] * 6, np.float32) / 255.0
KEYPOSE_LINK_COLORS = np.asarray(
    [_KP_GREEN, _KP_GREEN, _KP_ORANGE, _KP_ORANGE] + [_KP_BLUE] * 4
    + [_KP_GREEN, _KP_ORANGE, _KP_GREEN, _KP_ORANGE] + [_KP_BLUE] * 7,
    np.float32) / 255.0


def init(key, width: int = 64, n_blocks: int = 6,
         dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, n_blocks * 2 + 8))
    p: Params = {
        "stem1": L.conv_init(next(ks), 3, 3, 3, width, dtype),
        "stem2": L.conv_init(next(ks), 3, 3, width, width, dtype),
        "stem3": L.conv_init(next(ks), 3, 3, width, width * 2, dtype),
        "blocks": [],
        "head1": L.conv_init(next(ks), 1, 1, width * 2, width, dtype),
        "head2": L.conv_init(next(ks), 1, 1, width, N_KEYPOINTS, dtype),
        "paf1": L.conv_init(next(ks), 1, 1, width * 2, width, dtype),
        "paf2": L.conv_init(next(ks), 1, 1, width, 2 * len(LIMBS), dtype),
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


def heatmaps_and_pafs(params: Params, images: jax.Array):
    """images [B,H,W,3] -> (confidence maps [B,h,w,18],
    part-affinity fields [B,h,w,2*L])."""
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
    feat = x
    maps = L.conv2d(params["head2"],
                    jax.nn.relu(L.conv2d(params["head1"], feat)))
    if "paf1" not in params:     # older param trees: no PAF head
        return maps, None
    pafs = L.conv2d(params["paf2"],
                    jax.nn.relu(L.conv2d(params["paf1"], feat)))
    return maps, pafs


def decode_keypoints(maps: jax.Array, apply_sigmoid: bool = True):
    """[B,h,w,K] -> (xy [B,K,2] in 0..1 coords, confidence [B,K])."""
    b, h, w, k = maps.shape
    flat = maps.reshape(b, h * w, k)
    idx = jnp.argmax(flat, axis=1)                      # [B,K]
    conf = jnp.max(flat, axis=1)
    if apply_sigmoid:
        conf = jax.nn.sigmoid(conf)
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


def render_keypose(keypoints: jax.Array, conf: jax.Array, height: int,
                   width: int, threshold: float = 0.4,
                   radius_px: float = 4.0,
                   thickness_px: float = 2.0) -> jax.Array:
    """T2I-Adapter keypose hint render: keypoints [B,K,2] (0..1,
    openpose-18 order), conf [B,K] -> canvas [B,H,W,3].

    Reference render_keypose (mmpose_pipeline.py:91-135) draws cv2
    circles (radius 2..4) at joints and 2px lines for the COCO-17
    skeleton in the fixed blue/green/orange palette on black; this is
    the distance-field equivalent, batched on device. Distinct from the
    openpose render (thick limbs, 17-color wheel, no joint dots)."""
    kp = keypoints[:, KEYPOSE_FROM_OPENPOSE]              # [B,17,2]
    cf = conf[:, KEYPOSE_FROM_OPENPOSE]                   # [B,17]
    b = kp.shape[0]
    yy = jnp.linspace(0, 1, height)[None, :, None]
    xx = jnp.linspace(0, 1, width)[None, None, :]
    scale = float(max(height, width))
    r = radius_px / scale
    lw = 0.5 * thickness_px / scale
    canvas = jnp.zeros((b, height, width, 3), jnp.float32)
    link_c = jnp.asarray(KEYPOSE_LINK_COLORS)
    for li, (a, bk) in enumerate(KEYPOSE_SKELETON):
        pa, pb = kp[:, a], kp[:, bk]
        ok = ((cf[:, a] > threshold) &
              (cf[:, bk] > threshold)).astype(jnp.float32)
        dx = pb[:, 0] - pa[:, 0]
        dy = pb[:, 1] - pa[:, 1]
        len2 = jnp.maximum(dx ** 2 + dy ** 2, 1e-8)
        px = xx - pa[:, 0][:, None, None]
        py = yy - pa[:, 1][:, None, None]
        t = jnp.clip((px * dx[:, None, None] + py * dy[:, None, None]) /
                     len2[:, None, None], 0.0, 1.0)
        dist2 = (px - t * dx[:, None, None]) ** 2 + \
            (py - t * dy[:, None, None]) ** 2
        mask = (dist2 < lw * lw).astype(jnp.float32) * ok[:, None, None]
        canvas = jnp.maximum(canvas, mask[..., None] * link_c[li])
    kpt_c = jnp.asarray(KEYPOSE_KPT_COLORS)
    for j in range(kp.shape[1]):
        ok = (cf[:, j] > threshold).astype(jnp.float32)
        d2 = (xx - kp[:, j, 0][:, None, None]) ** 2 + \
            (yy - kp[:, j, 1][:, None, None]) ** 2
        mask = (d2 < r * r).astype(jnp.float32) * ok[:, None, None]
        # joints draw over links, as cv2.circle after cv2.line would
        canvas = jnp.where(mask[..., None] > 0, kpt_c[j], canvas)
    return canvas


def render_pose(keypoints, conf, height, width, style: str = "openpose",
                threshold: float | None = None):
    """Style dispatch: openpose (thick 17-color limbs) or keypose
    (T2I-Adapter dots+thin lines)."""
    if style == "keypose":
        return render_keypose(keypoints, conf, height, width,
                              **({} if threshold is None
                                 else {"threshold": threshold}))
    return render_openpose(keypoints, conf, height, width,
                           **({} if threshold is None
                              else {"threshold": threshold}))


def estimate_and_render(params: Params, images: jax.Array,
                        style: str = "openpose") -> jax.Array:
    """Full hinter pipeline: image -> openpose skeleton map."""
    maps = heatmaps(params, images)
    kps, conf = decode_keypoints(maps)
    return render_pose(kps, conf, images.shape[1], images.shape[2],
                       style=style)


# ------------------------------------------------------- multi-person


def top_peaks(maps: jax.Array, max_people: int = 8,
              nms_window: int = 3, apply_sigmoid: bool = True):
    """Per-keypoint spatial peaks: 3x3 NMS then top_k, static shapes.
    maps [B,h,w,K] -> (xy [B,K,P,2] in 0..1, conf [B,K,P]).
    apply_sigmoid=False for checkpoints whose heatmaps are already
    [0,1]-valued (the MSE-trained openpose body model)."""
    b, h, w, k = maps.shape
    pooled = jax.lax.reduce_window(
        maps, -jnp.inf, jax.lax.max,
        (1, nms_window, nms_window, 1), (1, 1, 1, 1), "SAME")
    peaks = jnp.where(maps >= pooled, maps, -jnp.inf)
    flat = peaks.transpose(0, 3, 1, 2).reshape(b, k, h * w)
    vals, idx = jax.lax.top_k(flat, max_people)          # [B,K,P]
    ys = (idx // w).astype(jnp.float32) / max(h - 1, 1)
    xs = (idx % w).astype(jnp.float32) / max(w - 1, 1)
    conf = jax.nn.sigmoid(vals) if apply_sigmoid \
        else jnp.where(jnp.isfinite(vals), vals, 0.0)
    return jnp.stack([xs, ys], axis=-1), conf


def _paf_score(paf_x, paf_y, pa, pb, samples: int = 10):
    """OpenPose limb score: mean dot product of the PAF along the segment
    pa->pb. paf_x/paf_y [h,w]; pa/pb [2] in 0..1 -> scalar."""
    h, w = paf_x.shape
    t = jnp.linspace(0.0, 1.0, samples)
    xs = pa[0] + (pb[0] - pa[0]) * t
    ys = pa[1] + (pb[1] - pa[1]) * t
    xi = jnp.clip((xs * (w - 1)).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((ys * (h - 1)).astype(jnp.int32), 0, h - 1)
    vx = paf_x[yi, xi]
    vy = paf_y[yi, xi]
    d = pb - pa
    norm = jnp.sqrt(jnp.sum(d ** 2) + 1e-8)
    u = d / norm
    return jnp.mean(vx * u[0] + vy * u[1])


def match_limbs(xy: jax.Array, conf: jax.Array, pafs: jax.Array,
                conf_threshold: float = 0.3,
                paf_threshold: float = 0.05):
    """Mutual-best PAF matching per limb (one batch element).

    xy [K,P,2], conf [K,P], pafs [h,w,2L] ->
    (pa [L,P,2], pb [L,P,2], ok [L,P]): for each limb up to P matched
    segments; unmatched slots have ok=0. A candidate pair survives iff
    each endpoint is the other's best-scoring partner, both keypoint
    confidences pass, and the PAF line integral is positive — the static
    equivalent of OpenPose's greedy bipartite assignment."""
    pa, pb, ok, _ = _match_limbs_full(xy, conf, pafs, conf_threshold,
                                      paf_threshold)
    return pa, pb, ok


def match_limb_indices(xy: jax.Array, conf: jax.Array, pafs: jax.Array,
                       conf_threshold: float = 0.3,
                       paf_threshold: float = 0.05):
    """Like match_limbs but returns (best_j [L,P] int32, ok [L,P]):
    per limb, peak i of the limb's A-joint matches peak best_j[i] of its
    B-joint (valid where ok). Used for person grouping."""
    _, _, ok, best_j = _match_limbs_full(xy, conf, pafs, conf_threshold,
                                         paf_threshold)
    return best_j, ok


def _match_limbs_full(xy, conf, pafs, conf_threshold, paf_threshold):
    p = xy.shape[1]
    pa_out, pb_out, ok_out, bj_out = [], [], [], []
    for li, (a, b) in enumerate(LIMBS):
        paf_x = pafs[..., 2 * li]
        paf_y = pafs[..., 2 * li + 1]
        score = jax.vmap(lambda i: jax.vmap(lambda j: _paf_score(
            paf_x, paf_y, xy[a, i], xy[b, j]))(jnp.arange(p)))(
            jnp.arange(p))                                # [P,P]
        valid = (conf[a][:, None] > conf_threshold) & \
            (conf[b][None, :] > conf_threshold)
        score = jnp.where(valid, score, -jnp.inf)
        best_j = jnp.argmax(score, axis=1)                # [P]
        best_i = jnp.argmax(score, axis=0)                # [P]
        mutual = best_i[best_j] == jnp.arange(p)
        s_best = jnp.take_along_axis(score, best_j[:, None],
                                     axis=1)[:, 0]
        ok = mutual & (s_best > paf_threshold)
        pa_out.append(xy[a])
        pb_out.append(xy[b][best_j])
        ok_out.append(ok.astype(jnp.float32))
        bj_out.append(best_j.astype(jnp.int32))
    return (jnp.stack(pa_out), jnp.stack(pb_out), jnp.stack(ok_out),
            jnp.stack(bj_out))


def render_limbs(pa: jax.Array, pb: jax.Array, ok: jax.Array,
                 height: int, width: int,
                 limb_width: float = 0.02) -> jax.Array:
    """Rasterize matched limb segments: pa/pb [L,P,2], ok [L,P] ->
    [H,W,3] openpose-colored canvas."""
    yy = jnp.linspace(0, 1, height)[:, None]
    xx = jnp.linspace(0, 1, width)[None, :]
    colors = jnp.asarray(LIMB_COLORS)

    def limb_layer(pa_l, pb_l, ok_l, color):
        def seg(p0, p1, o):
            dx, dy = p1[0] - p0[0], p1[1] - p0[1]
            len2 = jnp.maximum(dx ** 2 + dy ** 2, 1e-8)
            px = xx - p0[0]
            py = yy - p0[1]
            t = jnp.clip((px * dx + py * dy) / len2, 0.0, 1.0)
            dist = jnp.sqrt((px - t * dx) ** 2 + (py - t * dy) ** 2)
            return (dist < limb_width).astype(jnp.float32) * o
        masks = jax.vmap(seg)(pa_l, pb_l, ok_l)           # [P,H,W]
        return masks.max(axis=0)[..., None] * color

    layers = jax.vmap(limb_layer)(pa, pb, ok, colors)     # [L,H,W,3]
    return layers.max(axis=0)


def estimate_and_render_multi(params: Params, images: jax.Array,
                              max_people: int = 8,
                              style: str = "openpose") -> jax.Array:
    """Multi-person hinter pipeline: image -> openpose skeleton map with
    every PAF-validated limb drawn (person grouping is unnecessary for
    hint images). Falls back to single-person argmax when the param tree
    has no PAF head. keypose style renders from the single-person decode
    (per-person joint sets; the topdown path is the full-quality route)."""
    maps, pafs = heatmaps_and_pafs(params, images)
    if pafs is None or style == "keypose":
        kps, conf = decode_keypoints(maps)
        return render_pose(kps, conf, images.shape[1], images.shape[2],
                           style=style)
    xy, conf = top_peaks(maps, max_people)

    def one(xy_b, conf_b, paf_b):
        pa, pb, ok = match_limbs(xy_b, conf_b, paf_b)
        return render_limbs(pa, pb, ok, images.shape[1], images.shape[2])

    return jax.vmap(one)(xy, conf, pafs)


# ----------------------------------------- OpenPose body model (CMU CPM)
# The published `body_pose_model.pth` architecture the reference drives
# through controlnet-era annotators (reference pose hinting,
# gyre/pipeline/hinters/mmpose_pipeline.py renders the same openpose
# skeleton surface): VGG19-derived stem at stride 8 feeding 6 refinement
# stages with two branches — L1 part-affinity fields (38ch), L2 keypoint
# confidence maps (19ch = 18 joints + background).

# stem spec: (name, c_in, c_out) convs, "pool" = 2x2/2 max-pool
BODY_STEM = [
    ("conv1_1", 3, 64), ("conv1_2", 64, 64), "pool",
    ("conv2_1", 64, 128), ("conv2_2", 128, 128), "pool",
    ("conv3_1", 128, 256), ("conv3_2", 256, 256),
    ("conv3_3", 256, 256), ("conv3_4", 256, 256), "pool",
    ("conv4_1", 256, 512), ("conv4_2", 512, 512),
    ("conv4_3_CPM", 512, 256), ("conv4_4_CPM", 256, 128),
]
N_PAF = 2 * len(LIMBS) + 4      # 38 channels (19 limb pairs incl. ears)
N_HEAT = N_KEYPOINTS + 1        # + background

# PAF channel pair per LIMBS entry, in the checkpoint's native channel
# order (the openpose mapIdx table shifted by -19)
LIMB_PAF = [(12, 13), (20, 21), (14, 15), (16, 17), (22, 23), (24, 25),
            (0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (10, 11), (28, 29),
            (30, 31), (34, 35), (32, 33), (36, 37)]


def _stage_spec(stage: int, out_ch: int):
    """(name, c_in, c_out, ksize) conv list for one refinement branch."""
    if stage == 1:
        b = "L1" if out_ch == N_PAF else "L2"
        return [(f"conv5_1_CPM_{b}", 128, 128, 3),
                (f"conv5_2_CPM_{b}", 128, 128, 3),
                (f"conv5_3_CPM_{b}", 128, 128, 3),
                (f"conv5_4_CPM_{b}", 128, 512, 1),
                (f"conv5_5_CPM_{b}", 512, out_ch, 1)]
    b = "L1" if out_ch == N_PAF else "L2"
    c_in = 128 + N_PAF + N_HEAT
    names = [(f"Mconv1_stage{stage}_{b}", c_in, 128, 7)]
    for i in range(2, 6):
        names.append((f"Mconv{i}_stage{stage}_{b}", 128, 128, 7))
    names.append((f"Mconv6_stage{stage}_{b}", 128, 128, 1))
    names.append((f"Mconv7_stage{stage}_{b}", 128, out_ch, 1))
    return names


def body_init(key, dtype=jnp.float32) -> Params:
    """Random-init OpenPose body params (same tree layout as load_body)."""
    ks = iter(jax.random.split(key, 200))
    stem = [L.conv_init(next(ks), 3, 3, ci, co, dtype)
            for e in BODY_STEM if e != "pool" for (_, ci, co) in [e]]
    stages = []
    for s in range(1, 7):
        branch = {}
        for tag, out_ch in (("paf", N_PAF), ("heat", N_HEAT)):
            branch[tag] = [L.conv_init(next(ks), k, k, ci, co, dtype)
                           for (_, ci, co, k) in _stage_spec(s, out_ch)]
        stages.append(branch)
    return {"stem": stem, "stages": stages}


def load_body(state: dict, dtype=None) -> Params:
    """Load the published openpose body checkpoint (`body_pose_model.pth`
    key layout: model0.conv1_1.* stem, model{s}_{1,2}.{conv5_*_CPM_L%,
    Mconv*_stage%_L%}.* branches). Consumes 100% of keys."""
    from .load import KeyMapper, _conv_p

    if not any(k.startswith("model0.") for k in state):
        # DataParallel-era checkpoints prefix "module."
        state = {k.split("module.", 1)[-1]: v for k, v in state.items()}
    m = KeyMapper(state, dtype)
    stem = [_conv_p(m, f"model0.{name}")
            for e in BODY_STEM if e != "pool" for (name, _, _) in [e]]
    stages = []
    for s in range(1, 7):
        branch = {}
        for bi, (tag, out_ch) in enumerate((("paf", N_PAF),
                                            ("heat", N_HEAT)), start=1):
            pre = f"model{s}_{bi}"
            branch[tag] = [_conv_p(m, f"{pre}.{name}")
                           for (name, _, _, _) in _stage_spec(s, out_ch)]
        stages.append(branch)
    return {"stem": stem, "stages": stages}


def _max_pool_2x(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _body_branch(convs, x):
    for p in convs[:-1]:
        x = jax.nn.relu(L.conv2d(p, x))
    return L.conv2d(convs[-1], x)


def body_apply(params: Params, images: jax.Array):
    """images [B,H,W,3] RGB in [0,1] -> (heat [B,H/8,W/8,18],
    pafs [B,H/8,W/8,2*len(LIMBS)] permuted into LIMBS order).

    Input convention matches the published annotator: BGR, value-shifted
    by -0.5 (caffe-era preprocessing).
    """
    x = images[..., ::-1].astype(jnp.float32) - 0.5
    it = iter(params["stem"])
    for e in BODY_STEM:
        if e == "pool":
            x = _max_pool_2x(x)
        else:
            x = jax.nn.relu(L.conv2d(next(it), x))
    feat = x
    paf = _body_branch(params["stages"][0]["paf"], feat)
    heat = _body_branch(params["stages"][0]["heat"], feat)
    for branch in params["stages"][1:]:
        inp = jnp.concatenate([paf, heat, feat], axis=-1)
        paf = _body_branch(branch["paf"], inp)
        heat = _body_branch(branch["heat"], inp)
    perm = np.asarray(LIMB_PAF).reshape(-1)
    return heat[..., :N_KEYPOINTS], paf[..., perm]


def estimate_and_render_body(params: Params, images: jax.Array,
                             max_people: int = 8,
                             style: str = "openpose") -> jax.Array:
    """Checkpoint-weight pose hinter: openpose body CPM -> multi-person
    PAF matching -> skeleton canvas. Heatmap values are already in [0,1]
    (MSE-trained Gaussian peaks), so confidences are used raw with the
    published thresholds (thre1=0.1, thre2=0.05)."""
    maps, pafs = body_apply(params, images)
    if style == "keypose":
        kps, conf = decode_keypoints(maps, apply_sigmoid=False)
        return render_pose(kps, conf, images.shape[1], images.shape[2],
                           style=style, threshold=0.1)
    xy, conf = top_peaks(maps, max_people, apply_sigmoid=False)

    def one(xy_b, conf_b, paf_b):
        pa, pb, ok = match_limbs(xy_b, conf_b, paf_b,
                                 conf_threshold=0.1, paf_threshold=0.05)
        return render_limbs(pa, pb, ok, images.shape[1], images.shape[2])

    return jax.vmap(one)(xy, conf, pafs)


# --------------------------------------------- top-down refinement
# The reference's pose stack is top-down: an mmdet person detector crops
# each person, then mmpose refines keypoints per crop
# (gyre/pipeline/hinters/mmpose_pipeline.py:60-180). Redesigned
# detector-free for TPU: the bottom-up PAF pass above IS the person
# detector — accepted limbs are union-found into person clusters (host,
# runs once per request like the reference's python decode), and one
# batched compiled pass re-runs the SAME network on max_people
# fixed-size crops, where per-joint argmax is exact because each crop
# frames one person at much higher effective resolution.


def group_people(xy, conf, best_j, ok, min_joints: int = 3,
                 margin: float = 0.25, max_people: int = 8):
    """Union-find accepted limbs into person clusters -> square-ish
    crop boxes. Host-side numpy (tiny arrays: [K,P] indices).

    xy [K,P,2] 0..1, conf [K,P], best_j/ok [L,P] -> (boxes [M,4]
    (x0,y0,x1,y1) in 0..1, valid [M] bool), M = max_people.
    """
    xy = np.asarray(xy)
    conf = np.asarray(conf)
    best_j = np.asarray(best_j)
    ok = np.asarray(ok)
    p = xy.shape[1]

    parent = {}

    def find(n):
        while parent.setdefault(n, n) != n:
            parent[n] = parent[parent[n]]
            n = parent[n]
        return n

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for li, (a, b) in enumerate(LIMBS):
        for i in range(p):
            if ok[li, i] > 0:
                union((a, i), (b, int(best_j[li, i])))

    clusters: dict = {}
    for node in list(parent):
        clusters.setdefault(find(node), []).append(node)

    boxes, valid = [], []
    for members in sorted(clusters.values(), key=len, reverse=True):
        joints = {k for (k, _) in members}
        if len(joints) < min_joints:
            continue
        pts = np.stack([xy[k, i] for (k, i) in members])
        x0, y0 = pts.min(axis=0)
        x1, y1 = pts.max(axis=0)
        # expand: margin fraction of the larger side, min size floor so
        # a head-only cluster still crops enough context
        side = max(x1 - x0, y1 - y0, 0.1)
        mx = my = margin * side
        boxes.append([max(x0 - mx, 0.0), max(y0 - my, 0.0),
                      min(x1 + mx, 1.0), min(y1 + my, 1.0)])
        valid.append(True)
        if len(boxes) >= max_people:
            break
    while len(boxes) < max_people:
        boxes.append([0.0, 0.0, 1.0, 1.0])
        valid.append(False)
    return (np.asarray(boxes, np.float32),
            np.asarray(valid, np.bool_))


def _bilinear_crop(image: jax.Array, box: jax.Array, crop: int):
    """Sample a [crop,crop,3] patch of `image` [H,W,3] over the 0..1 box
    (x0,y0,x1,y1) with bilinear interpolation (traced box -> static
    output shape, jit/vmap-friendly)."""
    h, w = image.shape[0], image.shape[1]
    x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
    ys = (y0 + (y1 - y0) * jnp.linspace(0.0, 1.0, crop)) * (h - 1)
    xs = (x0 + (x1 - x0) * jnp.linspace(0.0, 1.0, crop)) * (w - 1)
    yi = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 2)
    xi = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 2)
    fy = (ys - yi)[:, None, None]
    fx = (xs - xi)[None, :, None]
    rows0 = image[yi]                                  # [C,W,3]
    rows1 = image[yi + 1]
    p00 = rows0[:, xi]
    p01 = rows0[:, xi + 1]
    p10 = rows1[:, xi]
    p11 = rows1[:, xi + 1]
    return (p00 * (1 - fy) * (1 - fx) + p01 * (1 - fy) * fx +
            p10 * fy * (1 - fx) + p11 * fy * fx)


def _refine_pass(params, image, boxes, valid, height, width,
                 crop, body, threshold, style="openpose"):
    """Compiled second pass: crop -> re-run net -> single-person argmax
    decode -> per-person skeleton canvases, max-combined."""
    crops = jax.vmap(lambda b: _bilinear_crop(image, b, crop))(boxes)
    if body:
        heat, _ = body_apply(params, crops)
    else:
        heat, _ = heatmaps_and_pafs(params, crops)
    kps, conf = decode_keypoints(heat, apply_sigmoid=not body)  # [M,K,*]
    # crop coords -> image coords
    origin = boxes[:, None, 0:2]
    size = boxes[:, None, 2:4] - origin
    kps = origin + kps * size
    conf = conf * valid[:, None]

    def one(kp, cf):
        return render_pose(kp[None], cf[None], height, width,
                           style=style, threshold=threshold)[0]

    return jax.vmap(one)(kps, conf).max(axis=0)


def make_topdown(params: Params, body: bool = True, max_people: int = 8,
                 crop: int = 368, threshold: float = 0.1):
    """Build the two-pass top-down pose hinter. Returns a callable
    ([B,H,W,3], style=) -> [B,H,W,3] skeleton canvas (style: openpose |
    keypose, the reference estimator's output_format contract,
    mmpose_pipeline.py:254). Jitted programs per style with a host
    union-find between them; compiled once each, reused across
    requests."""
    sig = not body  # random-init PoseNet emits logits; body CPM emits [0,1]

    @jax.jit
    def coarse(images):
        if body:
            maps, pafs = body_apply(params, images)
        else:
            maps, pafs = heatmaps_and_pafs(params, images)
        xy, conf = top_peaks(maps, max_people, apply_sigmoid=sig)
        bj, ok = jax.vmap(lambda x, c, pf: match_limb_indices(
            x, c, pf, conf_threshold=threshold,
            paf_threshold=0.05))(xy, conf, pafs)
        return xy, conf, bj, ok

    from functools import partial

    @partial(jax.jit, static_argnums=(4,))
    def refine(image, boxes, valid, fallback, style):
        out = _refine_pass(params, image, boxes, valid,
                           image.shape[0], image.shape[1],
                           crop, body, threshold, style=style)
        # no people found -> keep the bottom-up render
        return jnp.where(jnp.any(valid), out, fallback)

    bottom_up = estimate_and_render_body if body \
        else estimate_and_render_multi

    def run(images, style: str = "openpose"):
        images = jnp.asarray(images, jnp.float32)
        xy, conf, bj, ok = coarse(images)
        fallback = bottom_up(params, images, max_people=max_people,
                             style=style)
        outs = []
        for b in range(images.shape[0]):
            boxes, valid = group_people(xy[b], conf[b], bj[b], ok[b],
                                        max_people=max_people)
            outs.append(refine(images[b], jnp.asarray(boxes),
                               jnp.asarray(valid), fallback[b], style))
        return jnp.stack(outs)

    return run
