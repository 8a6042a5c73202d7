"""ImageAdjustment dispatch: the protocol's 17 image-operation messages
applied to tensors (reference apply_image_adjustment,
gyre/services/generate.py:166-386).

Pure-tensor ops run through ops/images; model-backed ops (depth /
segmentation / pose / background removal) borrow task engines from the
manager when configured, with documented tensor fallbacks (normal maps
derive from depth; edge detection falls back to sobel) so chains keep
working on deployments without hinter models.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..generated import generation_pb2 as pb
from ..ops import images as I

logger = logging.getLogger(__name__)

_RESCALE_FIT = {
    pb.RESCALE_STRICT: "strict",
    pb.RESCALE_COVER: "cover",
    pb.RESCALE_CONTAIN_ZERO: "contain",
    pb.RESCALE_CONTAIN_REPLICATE: "contain",
    pb.RESCALE_CONTAIN_REFLECT: "contain",
}

_CHANNEL_NAMES = {pb.CHANNEL_R: "r", pb.CHANNEL_G: "g", pb.CHANNEL_B: "b",
                  pb.CHANNEL_A: "a", pb.CHANNEL_ZERO: "zero",
                  pb.CHANNEL_ONE: "one"}


def apply_image_adjustment(image: jnp.ndarray, adjustments,
                           manager=None, engine_id: str | None = None,
                           seed: int = 0) -> jnp.ndarray:
    """image [B,H,W,C] float 0..1; adjustments: repeated ImageAdjustment.

    `ctx` carries cross-adjustment state within one chain: the memorised
    background mask that `background_removal.reapply` re-uses (reference
    bgmask variable, gyre/services/generate.py:331-339)."""
    img = jnp.asarray(image, jnp.float32)
    ctx: dict = {}
    for adj in adjustments:
        which = adj.WhichOneof("adjustment")
        if which is None:
            continue
        # each ImageAdjustment may name its own converter engine
        # (ImageAdjustment.engine_id, set by e.g. the client's
        # hint_from_image "type:converter_id:path" syntax); fall back to
        # the chain-level engine
        img = _APPLIERS[which](img, getattr(adj, which), manager,
                               adj.engine_id or engine_id, seed, ctx)
    return img


def _blur(img, a, *_):
    direction = {pb.DIRECTION_UP: "up", pb.DIRECTION_DOWN: "down"}.get(
        a.direction)
    if direction:
        return I.directionalblur(img, a.sigma or 1.0, direction)
    return I.gaussian_blur(img, a.sigma or 1.0)


def _invert(img, a, *_):
    return I.invert(img)


def _levels(img, a, *_):
    return I.levels(img, a.input_low, a.input_high or 1.0, a.output_low,
                    a.output_high or 1.0)


def _channels(img, a, *_):
    # build output channel-by-channel from sources
    b, h, w, c = img.shape
    srcs = [a.r, a.g, a.b, a.a]
    outs = []
    for i, src in enumerate(srcs):
        if src == pb.CHANNEL_DISCARD:
            continue
        name = _CHANNEL_NAMES.get(src, "zero")
        if name == "zero":
            outs.append(jnp.zeros((b, h, w, 1), img.dtype))
        elif name == "one":
            outs.append(jnp.ones((b, h, w, 1), img.dtype))
        else:
            idx = I.CHANNEL_INDEX[name]
            if idx < c:
                outs.append(img[..., idx:idx + 1])
            else:
                outs.append(jnp.ones((b, h, w, 1), img.dtype))
    return jnp.concatenate(outs, axis=-1)


def _rescale(img, a, *_):
    return I.rescale(img, a.height, a.width,
                     fit=_RESCALE_FIT.get(a.mode, "strict"))


def _autoscale(img, a, *_):
    return I.autoscale(img, a.height or img.shape[1],
                       a.width or img.shape[2])


def _crop(img, a, *_):
    return I.crop(img, a.top, a.left, a.height or img.shape[1] - a.top,
                  a.width or img.shape[2] - a.left)


def _canny(img, a, *_):
    edges = I.canny_edge(img, a.low_threshold or 0.1,
                         a.high_threshold or 0.2)
    return jnp.tile(edges, (1, 1, 1, 3))


def _edge(img, a, manager, engine_id, seed, ctx=None):
    """HED-style soft edge; falls back to sobel magnitude."""
    model = _task_engine(manager, "edge", engine_id)
    if model is not None:
        return model(img)
    mag, _ = I.sobel_edges(I.gaussian_blur(img, 1.0))
    return jnp.tile(jnp.clip(mag * 2.0, 0, 1), (1, 1, 1, 3))


def _depth(img, a, manager, engine_id, seed, ctx=None):
    model = _task_engine(manager, "depth", engine_id)
    if model is not None:
        return model(img)
    # luminance+blur proxy keeps chains runnable without a depth engine
    logger.warning("no depth engine configured; using luminance proxy")
    g = I.gaussian_blur(I.to_grayscale(img), 2.0)
    return jnp.tile(I.normalise(g), (1, 1, 1, 3))


def _segmentation(img, a, manager, engine_id, seed, ctx=None):
    model = _task_engine(manager, "segmentation", engine_id)
    if model is not None:
        return model(img)
    return I.palletize(I.gaussian_blur(img, 4.0), 8)


def _openpose(img, a, manager, engine_id, seed, ctx=None):
    return _pose(img, manager, engine_id, style="openpose")


def _keypose(img, a, manager, engine_id, seed, ctx=None):
    # distinct T2I-Adapter keypose render (what t2i-adapter-keypose was
    # trained on); reference estimator(tensor, output_format="keypose"),
    # gyre/services/generate.py:321-329
    return _pose(img, manager, engine_id, style="keypose")


def _pose(img, manager, engine_id, style: str):
    model = _task_engine(manager, "pose", engine_id)
    if model is not None:
        try:
            return model(img, style=style)
        except TypeError:   # style-unaware pose pipeline
            return model(img)
    raise NotImplementedError(
        "pose estimation requires a configured pose engine")


def _normal(img, a, manager=None, engine_id=None, seed=0, ctx=None):
    # model-backed first: a BAE normal engine when configured (reference
    # BaenormalPipeline); tensor fallback derives normals from luminance
    # as a depth proxy
    model = _task_engine(manager, "normal", engine_id) \
        if manager is not None else None
    if model is not None:
        n = model(img)
        if a.postblur:
            n = I.gaussian_blur(n, a.postblur)
        return n
    depth = I.to_grayscale(img)
    if a.preblur:
        depth = I.gaussian_blur(depth, a.preblur)
    n = I.normalmap_from_depthmap(depth,
                                  a.background_threshold or 0.05)
    if a.postblur:
        n = I.gaussian_blur(n, a.postblur)
    return n


def _background_removal(img, a, manager, engine_id, seed, ctx=None):
    """Full BackgroundRemovalMode semantics (reference
    gyre/services/generate.py:331-363): compute-or-reapply the mask,
    then ALPHA (concat as alpha) / SOLID (black background) / BLUR
    (infill + blur composite) / NOTHING (memorise only)."""
    ctx = {} if ctx is None else ctx
    if a.reapply:
        mask = ctx.get("bgmask")
        if mask is None:
            raise ValueError("No mask memorised to reapply")
    else:
        model = _task_engine(manager, "background_removal", engine_id)
        if model is not None:
            mask = model(img)[..., 3:4]
        else:
            # contrast-based saliency fallback: center-weighted
            # threshold mask
            g = I.gaussian_blur(I.to_grayscale(img), 4.0)
            edge = jnp.abs(g - jnp.mean(g, axis=(1, 2, 3), keepdims=True))
            mask = (I.normalise(edge) > 0.25).astype(img.dtype)
        ctx["bgmask"] = mask
    mode = a.mode if a.HasField("mode") else pb.ALPHA
    if mode == pb.NOTHING:
        return img
    rgb = img[..., :3]
    if mode == pb.ALPHA:
        return jnp.concatenate([rgb, mask], axis=-1)
    if mode == pb.SOLID:
        return rgb * mask
    if mode == pb.BLUR:
        # reference: infill the subject area from the surrounding
        # background, heavy blur, composite (generate.py:356-359;
        # our infill keeps where mask_keep==1, so keep = background)
        bg = I.infill(rgb, 1.0 - mask, 26)
        bg = I.gaussian_blur(bg, 13.0)
        return rgb * mask + bg * (1.0 - mask)
    raise ValueError(f"Unknown background removal mode {mode}")


def _palletize(img, a, *_):
    return I.palletize(img, a.colours or 16)


def _quantize(img, a, *_):
    return I.quantize(img, a.threshold or 0.5)


def _shuffle(img, a, manager, engine_id, seed, ctx=None):
    return I.shuffle(img, jax.random.PRNGKey(seed))


def _task_engine(manager, task: str, engine_id):
    """Borrow a task pipeline (depth/edge/...) from the manager if one is
    configured (reference borrows engines by task,
    gyre/services/generate.py:166-386)."""
    if manager is None:
        return None
    getter = getattr(manager, "task_pipeline", None)
    if getter is None:
        return None
    return getter(task, engine_id)


_APPLIERS = {
    "blur": _blur, "invert": _invert, "levels": _levels,
    "channels": _channels, "rescale": _rescale, "autoscale": _autoscale,
    "crop": _crop, "canny_edge": _canny, "edge_detection": _edge,
    "depth": _depth, "segmentation": _segmentation, "keypose": _keypose,
    "openpose": _openpose, "normal": _normal,
    "background_removal": _background_removal, "palletize": _palletize,
    "quantize": _quantize, "shuffle": _shuffle,
}
