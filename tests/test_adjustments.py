"""ImageAdjustment dispatch tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.generated import generation_pb2 as pb
from gyre_tpu.services.adjustments import apply_image_adjustment


def _img(size=32):
    x = np.linspace(0, 1, size, dtype=np.float32)
    return jnp.asarray(np.tile(x[None, :, None], (size, 1, 3))[None])


def _adj(**kwargs):
    a = pb.ImageAdjustment()
    for which, fields in kwargs.items():
        sub = getattr(a, which)
        for k, v in fields.items():
            setattr(sub, k, v)
        if not fields:
            sub.SetInParent()
    return a


def test_blur_invert_levels_chain():
    img = _img()
    out = apply_image_adjustment(img, [
        _adj(blur={"sigma": 2.0}),
        _adj(invert={}),
        _adj(levels={"input_low": 0.2, "input_high": 0.8,
                     "output_low": 0.0, "output_high": 1.0}),
    ])
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()


def test_channels_rgba_swizzle():
    img = _img()
    out = apply_image_adjustment(img, [
        _adj(channels={"r": pb.CHANNEL_B, "g": pb.CHANNEL_ZERO,
                       "b": pb.CHANNEL_R, "a": pb.CHANNEL_DISCARD})])
    assert out.shape[-1] == 3
    np.testing.assert_allclose(np.asarray(out[..., 0]),
                               np.asarray(_img()[..., 2]))
    assert float(out[..., 1].max()) == 0.0


def test_rescale_and_crop():
    img = _img(32)
    out = apply_image_adjustment(img, [
        _adj(rescale={"height": 16, "width": 24, "mode": pb.RESCALE_COVER}),
        _adj(crop={"top": 2, "left": 2, "height": 8, "width": 8}),
    ])
    assert out.shape == (1, 8, 8, 3)


def test_canny_and_normal():
    img = _img()
    edges = apply_image_adjustment(img, [_adj(canny_edge={
        "low_threshold": 0.1, "high_threshold": 0.3})])
    assert edges.shape == (1, 32, 32, 3)
    normal = apply_image_adjustment(img, [_adj(normal={
        "background_threshold": 0.05})])
    assert normal.shape == (1, 32, 32, 3)


def test_depth_fallback_and_palletize():
    img = _img()
    depth = apply_image_adjustment(img, [_adj(depth={})])
    assert depth.shape == (1, 32, 32, 3)
    pal = apply_image_adjustment(img, [_adj(palletize={"colours": 4})])
    assert len(np.unique(np.asarray(pal))) <= 4


def test_background_removal_fallback_adds_alpha():
    img = _img()
    out = apply_image_adjustment(img, [_adj(background_removal={})])
    assert out.shape[-1] == 4


def test_background_removal_modes():
    """BackgroundRemovalMode semantics (reference generate.py:331-363):
    ALPHA concat, SOLID zeroes the background, BLUR composites an
    infilled+blurred background, NOTHING passes through."""
    img = _img()
    alpha = apply_image_adjustment(
        img, [_adj(background_removal={"mode": pb.ALPHA})])
    assert alpha.shape[-1] == 4
    mask = np.asarray(alpha[..., 3:])

    nothing = apply_image_adjustment(
        img, [_adj(background_removal={"mode": pb.NOTHING})])
    np.testing.assert_allclose(np.asarray(nothing), np.asarray(img))

    solid = apply_image_adjustment(
        img, [_adj(background_removal={"mode": pb.SOLID})])
    assert solid.shape[-1] == 3
    np.testing.assert_allclose(np.asarray(solid),
                               np.asarray(img) * mask, atol=1e-6)

    blur = apply_image_adjustment(
        img, [_adj(background_removal={"mode": pb.BLUR})])
    assert blur.shape[-1] == 3
    # foreground pixels unchanged; background replaced with a blur
    fg = mask[0, ..., 0] > 0.5
    np.testing.assert_allclose(np.asarray(blur)[0][fg],
                               np.asarray(img)[0][fg], atol=1e-5)
    assert np.abs(np.asarray(blur)[0][~fg]
                  - np.asarray(img)[0][~fg]).max() > 1e-4


def test_background_removal_reapply():
    """reapply=True re-uses the memorised mask instead of re-running the
    remover; with no memorised mask it must raise."""
    img = _img()
    out = apply_image_adjustment(img, [
        _adj(background_removal={"mode": pb.NOTHING}),
        _adj(blur={"sigma": 1.0}),
        _adj(background_removal={"mode": pb.ALPHA, "reapply": True}),
    ])
    assert out.shape[-1] == 4
    with pytest.raises(ValueError):
        apply_image_adjustment(img, [
            _adj(background_removal={"mode": pb.ALPHA, "reapply": True})])


def test_model_backed_adjustment_engine_selection():
    """Model-backed adjustments pick the default task engine when no
    engine is named, and ImageAdjustment.engine_id selects a specific
    converter engine (reference per-adjustment engine_id,
    e.g. client hint_from_image type:converter_id:path)."""
    class FakeManager:
        def task_pipeline(self, task, engine_id=None):
            if task != "depth":
                return None
            if engine_id is None:
                return lambda img: jnp.zeros_like(img)     # default engine
            if engine_id == "depth-b":
                return lambda img: jnp.ones_like(img)      # named engine
            return None                                     # unknown id

    img = _img()
    out = apply_image_adjustment(img, [_adj(depth={})], FakeManager(), None)
    assert float(np.abs(np.asarray(out)).max()) == 0.0
    named = _adj(depth={})
    named.engine_id = "depth-b"
    out = apply_image_adjustment(img, [named], FakeManager(), None)
    assert float(np.asarray(out).min()) == 1.0


def test_adjustments_in_request():
    """Adjustment chain on an init-image artifact runs during extraction."""
    from gyre_tpu.ops import images as I
    from gyre_tpu.services.generate import extract_params
    from gyre_tpu.services.adjustments import apply_image_adjustment as ap

    req = pb.Request(engine_id="e")
    prompt = req.prompt.add()
    prompt.parameters.init = True
    prompt.artifact.type = pb.ARTIFACT_IMAGE
    prompt.artifact.binary = I.encode_png(np.asarray(_img(64)))
    blur = prompt.artifact.adjustments.add()
    blur.blur.sigma = 3.0
    p = extract_params(req, adjuster=lambda img, chain:
                       ap(img, chain, None, None))
    # blurred gradient has reduced dynamic range at the edges vs original
    assert p.init_image.shape == (1, 64, 64, 3)
    orig = np.asarray(_img(64))
    assert p.init_image.std() <= orig.std() + 1e-6
    assert np.abs(p.init_image - orig).max() > 1e-4
