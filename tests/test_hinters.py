"""Depth / HED hinter model tests + task-engine integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import hinters


def test_depth_shapes_and_normalization(rng_key):
    params = hinters.depth_init(rng_key, widths=(8, 16, 32, 32))
    img = jax.random.uniform(rng_key, (2, 64, 64, 3))
    d = hinters.depth_apply(params, img)
    assert d.shape == (2, 64, 64, 1)
    for i in range(2):
        assert abs(float(d[i].min())) < 1e-5
        assert abs(float(d[i].max()) - 1.0) < 1e-5


def test_hed_shapes(rng_key):
    params = hinters.hed_init(rng_key)
    img = jax.random.uniform(rng_key, (1, 64, 64, 3))
    e = hinters.hed_apply(params, img)
    assert e.shape == (1, 64, 64, 1)
    assert 0 <= float(e.min()) and float(e.max()) <= 1


def test_hed_weight_roundtrip(rng_key):
    """Export to HED checkpoint naming, reload, identical output."""
    from gyre_tpu.models.load import _inv_conv

    params = hinters.hed_init(rng_key)
    state = {}
    for i, stage in enumerate(params["stages"]):
        for j, conv in enumerate(stage):
            state[f"conv{i + 1}_{j + 1}.weight"] = _inv_conv(
                np.asarray(conv["w"]))
            state[f"conv{i + 1}_{j + 1}.bias"] = np.asarray(conv["b"])
    for i, side in enumerate(params["sides"]):
        state[f"score_dsn{i + 1}.weight"] = _inv_conv(np.asarray(side["w"]))
        state[f"score_dsn{i + 1}.bias"] = np.asarray(side["b"])
    state["score_final.weight"] = _inv_conv(np.asarray(params["fuse"]["w"]))
    back = hinters.load_hed_params(state)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    np.testing.assert_allclose(np.asarray(hinters.hed_apply(params, img)),
                               np.asarray(hinters.hed_apply(back, img)),
                               atol=1e-5)


def test_mlsd_lines(rng_key):
    params = hinters.mlsd_init(rng_key, widths=(8, 16, 32, 32))
    img = jax.random.uniform(rng_key, (1, 64, 64, 3))
    segs, scores = hinters.mlsd_detect(params, img, top_k=16)
    assert segs.shape == (1, 16, 4) and scores.shape == (1, 16)
    out = hinters.mlsd_apply(params, img)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    # renderer draws where scores exceed the threshold
    fixed_segs = jnp.asarray([[[0.2, 0.5, 0.8, 0.5]]], jnp.float32)
    hi = hinters.render_lines(fixed_segs, jnp.asarray([[0.9]]), 32, 32,
                              line_width=0.03)
    lo = hinters.render_lines(fixed_segs, jnp.asarray([[0.1]]), 32, 32,
                              line_width=0.03)
    assert float(hi.max()) == 1.0 and float(lo.max()) == 0.0
    # horizontal line through the middle rows, not the margins
    assert float(hi[0, 14:18, 16].max()) == 1.0
    assert float(hi[0, :8].max()) == 0.0


def test_segmentation_and_background_removal(rng_key):
    seg_params = hinters.seg_init(rng_key, n_classes=8,
                                  widths=(8, 16, 32, 32))
    img = jax.random.uniform(rng_key, (1, 64, 64, 3))
    seg = hinters.seg_apply(seg_params, img)
    assert seg.shape == (1, 64, 64, 3)
    # palette-rendered: limited distinct colors
    flat = np.asarray(seg).reshape(-1, 3)
    assert len(np.unique(flat, axis=0)) <= 8

    sal_params = hinters.saliency_init(rng_key, widths=(8, 16, 32, 32))
    rgba = hinters.remove_background(sal_params, img)
    assert rgba.shape == (1, 64, 64, 4)
    assert 0 <= float(rgba[..., 3].min()) and float(rgba[..., 3].max()) <= 1


def test_seg_bg_task_engines():
    from gyre_tpu.generated import generation_pb2 as pb
    from gyre_tpu.manager.manager import EngineManager
    from gyre_tpu.services.adjustments import apply_image_adjustment

    m = EngineManager(
        [{"id": "gen", "model": "preset/test", "default": True},
         {"id": "seg", "task": "segmentation"},
         {"id": "bg", "task": "background_removal"}],
        compute_dtype=jnp.float32)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                      jnp.float32)
    adj = pb.ImageAdjustment()
    adj.segmentation.SetInParent()
    out = apply_image_adjustment(img, [adj], m, None)
    assert out.shape == (1, 64, 64, 3)
    adj2 = pb.ImageAdjustment()
    adj2.background_removal.SetInParent()
    out2 = apply_image_adjustment(img, [adj2], m, None)
    assert out2.shape[-1] == 4


def test_depth_task_engine_in_adjustments():
    from gyre_tpu.generated import generation_pb2 as pb
    from gyre_tpu.manager.manager import EngineManager
    from gyre_tpu.services.adjustments import apply_image_adjustment

    m = EngineManager(
        [{"id": "gen", "model": "preset/test", "default": True},
         {"id": "midas-depth", "task": "depth",
          "params": {"widths": [8, 16, 32, 32]}}],
        compute_dtype=jnp.float32)
    adj = pb.ImageAdjustment()
    adj.depth.SetInParent()
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                      jnp.float32)
    out = apply_image_adjustment(img, [adj], m, None)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
