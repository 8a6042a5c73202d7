"""CodeFormer-style face restorer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import codeformer


def test_restore_shapes(rng_key):
    params = codeformer.init(rng_key, widths=(8, 16, 32, 32), embed_dim=32,
                             codebook_size=64, n_layers=2)
    img = jax.random.uniform(rng_key, (1, 64, 64, 3))
    out = codeformer.restore(params, img, fidelity=0.5)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert 0 <= float(out.min()) and float(out.max()) <= 1


def test_fidelity_controls_output(rng_key):
    params = codeformer.init(rng_key, widths=(8, 16, 32, 32), embed_dim=32,
                             codebook_size=64, n_layers=2)
    img = jax.random.uniform(rng_key, (1, 64, 64, 3))
    a = np.asarray(codeformer.restore(params, img, fidelity=0.0))
    b = np.asarray(codeformer.restore(params, img, fidelity=1.0))
    assert np.abs(a - b).max() > 1e-5


def test_face_restore_task_engine():
    from gyre_tpu.manager.manager import EngineManager

    m = EngineManager(
        [{"id": "gen", "model": "preset/test", "default": True},
         {"id": "codeformer", "task": "face_restore", "fidelity": 0.7}],
        compute_dtype=jnp.float32)
    pipe = m.task_pipeline("face_restore")
    img = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    out = np.asarray(pipe(img))
    assert out.shape == (1, 64, 64, 3)
