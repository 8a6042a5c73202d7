"""SwinIR tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import swinir


@pytest.fixture(scope="module")
def tiny():
    return swinir.init(jax.random.PRNGKey(0), embed_dim=16,
                       depths=(2, 2), heads=4, window=8)


def test_swinir_shapes(tiny):
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    out = swinir.apply(tiny, x, heads=4, window=8)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert 0 <= float(out.min()) and float(out.max()) <= 1


def test_window_partition_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 24, 5))
    wins = swinir._window_partition(x, 8)
    back = swinir._window_reverse(wins, 8, 16, 24)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_hat_shapes():
    from gyre_tpu.models import hat

    params = hat.init(jax.random.PRNGKey(0), embed_dim=16, depths=(2,),
                      heads=4, window=8, overlap=2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    out = hat.apply(params, x, heads=4, window=8, overlap=2)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_swinir_in_upscaler_pipeline(tiny):
    from functools import partial

    from gyre_tpu.pipeline.upscaler import UpscalerPipeline

    pipe = UpscalerPipeline(
        tiny, apply_fn=lambda p, x, s: swinir.apply(p, x, heads=4,
                                                    window=8, scale=s),
        scale=4, tile=16, overlap=4)
    img = np.random.RandomState(0).rand(1, 24, 24, 3).astype(np.float32)
    out = pipe(img)
    assert out.shape == (1, 96, 96, 3)
