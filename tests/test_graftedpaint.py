"""graftedpaint: grafted inpaint (9ch root + plain top) + weighted-prompt
sweeps — the reference's tests/graftedpaint.py + prompt_weights.py
scenarios at unit scale."""

import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.manager.manager import EngineManager
from gyre_tpu.models import configs

SIZE = 64


@pytest.fixture(scope="module")
def manager():
    import dataclasses as dc

    # register a tiny 9ch-inpaint preset for the root engine
    configs.PRESETS["test-inpaint"] = dc.replace(
        configs.SD_TEST, unet=dc.replace(configs.UNET_TEST, in_channels=9))
    m = EngineManager(
        [{"id": "root-inpaint", "model": {"preset": "test-inpaint"},
          "default": True, "graft": "top-style"},
         {"id": "top-style", "model": {"preset": "test", "seed": 7}},
         {"id": "plain-inpaint", "model": {"preset": "test-inpaint"}}],
        compute_dtype=jnp.float32, batch_max=2)
    m.load_engines()
    return m


def _mask_and_init():
    init = np.full((1, SIZE, SIZE, 3), 0.5, np.float32)
    init[:, :, : SIZE // 2] = 0.25
    mask = np.zeros((1, SIZE, SIZE, 1), np.float32)
    mask[:, SIZE // 4: 3 * SIZE // 4, SIZE // 4: 3 * SIZE // 4] = 1.0
    return init, mask


def test_grafted_inpaint_runs_and_differs(manager):
    """9ch inpaint root grafted with a 4ch top engine (k_euler_ancestral +
    churn + karras rho, the reference's graftedpaint settings)."""
    init, mask = _mask_and_init()
    kw = dict(prompt="a stained glass window", height=SIZE, width=SIZE,
              steps=4, sampler="k_euler_ancestral", seeds=[99],
              guidance_scale=7.5, init_image=init, mask_image=mask,
              strength=1.0, churn=0.4, karras_rho=7.0)
    grafted = np.asarray(manager.pipeline("root-inpaint")(**kw))
    plain = np.asarray(manager.pipeline("plain-inpaint")(**kw))
    assert np.isfinite(grafted).all()
    # kept area preserved in both
    np.testing.assert_allclose(grafted[0, 2:8, 2:8], init[0, 2:8, 2:8],
                               atol=0.02)
    # grafting the style engine changes the generated area
    assert np.abs(grafted - plain).max() > 1e-4


def test_weighted_prompts_shift_output(manager):
    """Weight sweep on competing tokens shifts results monotonically-ish
    (the reference's prompt_weights.py sweep at unit scale)."""
    pipe = manager.pipeline("top-style")
    kw = dict(height=SIZE, width=SIZE, steps=3, sampler="k_euler",
              seeds=[5], guidance_scale=7.5)
    base = np.asarray(pipe(prompt="a (red:1.0) and (blue:1.0) bird", **kw))
    red = np.asarray(pipe(prompt="a (red:1.5) and (blue:0.5) bird", **kw))
    blue = np.asarray(pipe(prompt="a (red:0.5) and (blue:1.5) bird", **kw))
    assert np.abs(base - red).max() > 1e-5
    assert np.abs(base - blue).max() > 1e-5
    assert np.abs(red - blue).max() > np.abs(base - red).max() * 0.5


def test_long_prompt_over_77_tokens(manager):
    pipe = manager.pipeline("top-style")
    long_prompt = ", ".join(f"element number {i}" for i in range(60))
    out = np.asarray(pipe(prompt=long_prompt, height=SIZE, width=SIZE,
                          steps=2, sampler="ddim", seeds=[1],
                          guidance_scale=7.5))
    assert np.isfinite(out).all()