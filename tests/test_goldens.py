"""Golden-render regression suite (VERDICT #7).

Scenarios keyed to the reference's golden harness scripts — happy_path
seeds (420420420, 50-step matrix at unit scale), graftedpaint settings
(k_euler_ancestral + churn 0.4 + karras_rho 7, reference
tests/graftedpaint.py:15-26) and prompt_weights sweeps (reference
tests/prompt_weights.py:27-50) — rendered through the real servicer with
the test-preset modelset and compared by SSIM against renders stored in
tests/fixtures/goldens/. Any numerics change in samplers, CFG, prompt
weighting, masks or the VAE shows up as an SSIM drop here.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.generated import generation_pb2 as pb
from gyre_tpu.http.router import FakeGrpcContext
from gyre_tpu.manager.manager import EngineManager
from gyre_tpu.ops import images as I
from gyre_tpu.services.generate import GenerationServiceServicer

from goldens import golden_compare

SIZE = 64
SEED = 420420420

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def generation():
    m = EngineManager(
        [{"id": "golden", "model": "preset/test", "default": True}],
        compute_dtype=jnp.float32, batch_max=2)
    m.load_engines()
    return GenerationServiceServicer(m, batch_max=2)


def _render(generation, req):
    answers = list(generation.Generate(req, FakeGrpcContext()))
    img = I.decode_png(answers[0].artifacts[0].binary)
    assert img.shape == (1, SIZE, SIZE, 3)
    return np.asarray(img[0])


def _base_request(prompt="a golden render", sampler=pb.SAMPLER_K_EULER,
                  steps=5, cfg=7.5, eta=0.0, churn=0.0, rho=0.0):
    req = pb.Request(engine_id="golden")
    p = req.prompt.add()
    p.text = prompt
    img = req.image
    img.height = SIZE
    img.width = SIZE
    img.steps = steps
    img.seed.append(SEED)
    img.transform.diffusion = sampler
    sp = img.parameters.add()
    sp.sampler.cfg_scale = cfg
    if eta:
        sp.sampler.eta = eta
    if churn:
        sp.sampler.churn.churn = churn
    if rho:
        sp.sampler.sigma.karras_rho = rho
    return req


def _init_image():
    return np.tile(np.linspace(0.15, 0.85, SIZE, dtype=np.float32)
                   [None, :, None], (SIZE, 1, 3))[None]


@pytest.mark.parametrize("sampler", [
    pb.SAMPLER_DDIM, pb.SAMPLER_K_EULER, pb.SAMPLER_K_DPMPP_2M,
    pb.SAMPLER_K_EULER_ANCESTRAL,
], ids=lambda s: pb.DiffusionSampler.Name(s))
def test_txt2img_golden(generation, sampler):
    img = _render(generation, _base_request(sampler=sampler))
    golden_compare(f"txt2img_{pb.DiffusionSampler.Name(sampler)}", img)


def test_img2img_golden(generation):
    req = _base_request()
    ip = req.prompt.add()
    ip.parameters.init = True
    ip.artifact.type = pb.ARTIFACT_IMAGE
    ip.artifact.binary = I.encode_png(_init_image())
    req.image.parameters[0].schedule.start = 0.5
    golden_compare("img2img_s05", _render(generation, req))


def test_inpaint_golden(generation):
    req = _base_request()
    ip = req.prompt.add()
    ip.parameters.init = True
    ip.artifact.type = pb.ARTIFACT_IMAGE
    ip.artifact.binary = I.encode_png(_init_image())
    mask = np.zeros((1, SIZE, SIZE, 1), np.float32)
    mask[:, : SIZE // 2] = 1.0
    mp = req.prompt.add()
    mp.artifact.type = pb.ARTIFACT_MASK
    mp.artifact.binary = I.encode_png(mask)
    golden_compare("inpaint_tophalf", _render(generation, req))


def test_graftedpaint_settings_golden(generation):
    """k_euler_ancestral + churn 0.4 + karras_rho 7 (the reference's
    graftedpaint sampler settings)."""
    req = _base_request(sampler=pb.SAMPLER_K_EULER_ANCESTRAL,
                        churn=0.4, rho=7.0)
    golden_compare("graftedpaint_settings", _render(generation, req))


def test_hires_fix_golden(generation):
    """Hires fix: generate at natural size, then merged high-res pass
    (ROADMAP testing follow-up: hires was invariant-tested only)."""
    req = _base_request()
    req.image.height = req.image.width = SIZE * 2
    req.image.hires.enable = True
    req.image.hires.oos_fraction = 0.25
    answers = list(generation.Generate(req, FakeGrpcContext()))
    img = I.decode_png(answers[0].artifacts[0].binary)
    assert img.shape == (1, SIZE * 2, SIZE * 2, 3)
    golden_compare("hires_2x", np.asarray(img[0]))


def test_grafted_inpaint_golden():
    """Grafted inpaint through the real servicer (9ch root + 4ch top),
    reference graftedpaint settings (ROADMAP testing follow-up: graft
    was invariant-tested only)."""
    import dataclasses as dc

    from gyre_tpu.models import configs

    configs.PRESETS["test-inpaint-golden"] = dc.replace(
        configs.SD_TEST, unet=dc.replace(configs.UNET_TEST, in_channels=9))
    m = EngineManager(
        [{"id": "root-inpaint",
          "model": {"preset": "test-inpaint-golden"},
          "default": True, "graft": "top-style"},
         {"id": "top-style", "model": {"preset": "test", "seed": 7}}],
        compute_dtype=jnp.float32, batch_max=2)
    m.load_engines()
    gen = GenerationServiceServicer(m, batch_max=2)

    req = _base_request(sampler=pb.SAMPLER_K_EULER_ANCESTRAL,
                        churn=0.4, rho=7.0)
    req.engine_id = "root-inpaint"
    ip = req.prompt.add()
    ip.parameters.init = True
    ip.artifact.type = pb.ARTIFACT_IMAGE
    ip.artifact.binary = I.encode_png(_init_image())
    mask = np.zeros((1, SIZE, SIZE, 1), np.float32)
    mask[:, SIZE // 4: 3 * SIZE // 4, SIZE // 4: 3 * SIZE // 4] = 1.0
    mp = req.prompt.add()
    mp.artifact.type = pb.ARTIFACT_MASK
    mp.artifact.binary = I.encode_png(mask)
    golden_compare("grafted_inpaint", _render(gen, req))


@pytest.mark.parametrize("weight", [-0.5, 0.5])
def test_prompt_weights_golden(generation, weight):
    """Weighted-fragment sweep: competing tokens at +/-0.5 (reference
    prompt_weights.py semantics). Each weight has its own golden, and the
    two renders must differ from each other."""
    req = _base_request(
        prompt=f"a (cat:{1 + weight:.2f}) and a (dog:{1 - weight:.2f})")
    img = _render(generation, req)
    golden_compare(f"prompt_weight_{weight:+.1f}".replace(".", "p"), img)


def test_prompt_weights_differ(generation):
    a = _render(generation, _base_request(prompt="a (cat:1.5) and a dog"))
    b = _render(generation, _base_request(prompt="a cat and a (dog:1.5)"))
    assert np.abs(a - b).max() > 1e-3
