"""The happy-path matrix: samplers x modes through the real servicer
(the reference's tests/happy_path.py combinatorial golden harness at unit
scale: {17 samplers x txt2img/img2img@strengths/inpaint@strengths}).

Runs request-level through GenerationServiceServicer with fixed seeds —
every cell must produce a finite PNG; fixed seeds must be stable across
runs (golden-hash style without stored goldens)."""

import hashlib

import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.generated import generation_pb2 as pb
from gyre_tpu.http.router import FakeGrpcContext
from gyre_tpu.manager.manager import EngineManager
from gyre_tpu.ops import images as I
from gyre_tpu.services.generate import GenerationServiceServicer

SIZE = 64
SEED = 420420420  # the reference harness's fixed seed


@pytest.fixture(scope="module")
def generation():
    m = EngineManager(
        [{"id": "hp", "model": "preset/test", "default": True}],
        compute_dtype=jnp.float32, batch_max=2)
    m.load_engines()
    return GenerationServiceServicer(m, batch_max=2)


def _request(sampler, mode, strength=1.0):
    req = pb.Request(engine_id="hp")
    p = req.prompt.add()
    p.text = "a happy path render"
    img = req.image
    img.height = SIZE
    img.width = SIZE
    img.steps = 3
    img.seed.append(SEED)
    img.transform.diffusion = sampler
    sp = img.parameters.add()
    sp.sampler.cfg_scale = 7.5
    if mode in ("img2img", "inpaint"):
        init = np.tile(np.linspace(0.2, 0.8, SIZE, dtype=np.float32)
                       [None, :, None], (SIZE, 1, 3))[None]
        ip = req.prompt.add()
        ip.parameters.init = True
        ip.artifact.type = pb.ARTIFACT_IMAGE
        ip.artifact.binary = I.encode_png(init)
        sp.schedule.start = strength
    if mode == "inpaint":
        mask = np.zeros((1, SIZE, SIZE, 1), np.float32)
        mask[:, : SIZE // 2] = 1.0
        mp = req.prompt.add()
        mp.artifact.type = pb.ARTIFACT_MASK
        mp.artifact.binary = I.encode_png(mask)
    return req


SAMPLERS = [
    pb.SAMPLER_DDIM, pb.SAMPLER_DDPM, pb.SAMPLER_K_EULER,
    pb.SAMPLER_K_EULER_ANCESTRAL, pb.SAMPLER_K_HEUN, pb.SAMPLER_K_LMS,
    pb.SAMPLER_K_DPMPP_2M, pb.SAMPLER_K_DPMPP_SDE,
    pb.SAMPLER_DPMSOLVERPP_3ORDER,
]
MODES = [("txt2img", 1.0), ("img2img", 0.5), ("img2img", 0.8),
         ("inpaint", 1.0)]


@pytest.mark.parametrize("sampler", SAMPLERS,
                         ids=lambda s: pb.DiffusionSampler.Name(s))
@pytest.mark.parametrize("mode,strength", MODES,
                         ids=[f"{m}-{s}" for m, s in MODES])
def test_matrix_cell(generation, sampler, mode, strength):
    req = _request(sampler, mode, strength)
    answers = list(generation.Generate(req, FakeGrpcContext()))
    assert len(answers) == 1
    art = answers[0].artifacts[0]
    img = I.decode_png(art.binary)
    assert img.shape == (1, SIZE, SIZE, 3)
    assert np.isfinite(img).all()
    assert art.seed == SEED
    # seed stability: re-run gives byte-identical PNG
    again = list(generation.Generate(req, FakeGrpcContext()))
    h1 = hashlib.sha256(art.binary).hexdigest()
    h2 = hashlib.sha256(again[0].artifacts[0].binary).hexdigest()
    assert h1 == h2
