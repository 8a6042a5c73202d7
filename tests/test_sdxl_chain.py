"""BASELINE config 5: SDXL base + refiner + upscale chain under
concurrent clients, on the tiny test presets (VERDICT missing #3 — no
refiner engine / chain existed).

The chain mirrors the reference's staged ChainGenerate routing
(gyre/services/generate.py:1202-1267): base txt2img PASSes its image to a
refiner img2img stage running the denoise tail (schedule.start < 0.5),
which PASSes to an ESRGAN upscale stage that RETURNs.
"""

import threading

import numpy as np
import pytest

from gyre_tpu.generated import generation_pb2 as pb
from gyre_tpu.http.router import FakeGrpcContext
from gyre_tpu.manager.manager import EngineManager
from gyre_tpu.ops import images as I
from gyre_tpu.services.generate import GenerationServiceServicer


@pytest.fixture(scope="module")
def manager():
    import jax.numpy as jnp

    m = EngineManager(
        [{"id": "xl-base", "name": "XL base", "model": "preset/test-xl",
          "default": True},
         {"id": "xl-refiner", "name": "XL refiner",
          "model": "preset/test-xl-refiner"},
         {"id": "esrgan-up", "task": "upscaler", "name": "Upscale",
          "blocks": 2, "tile": 32}],
        compute_dtype=jnp.float32, batch_max=2)
    m.load_engines()
    return m


@pytest.fixture(scope="module")
def generation(manager):
    return GenerationServiceServicer(manager, batch_max=2)


def _chain(seed=11):
    chain = pb.ChainRequest(request_id=f"xlchain-{seed}")

    def stage(sid, engine, steps=2, start=None, target=None, seed=seed):
        s = chain.stage.add()
        s.id = sid
        req = pb.Request(engine_id=engine)
        p = req.prompt.add()
        p.text = "a castle"
        img = req.image
        img.height = img.width = 64
        img.steps = steps
        img.samples = 1
        img.seed.append(seed)
        img.transform.diffusion = pb.SAMPLER_K_EULER
        sp = img.parameters.add()
        sp.sampler.cfg_scale = 7.5
        if start is not None:
            sp.schedule.start = start
        s.request.CopyFrom(req)
        on = s.on_status.add()
        if target:
            on.action.append(pb.STAGE_ACTION_PASS)
            on.target = target
        else:
            on.action.append(pb.STAGE_ACTION_RETURN)
        return s

    stage("base", "xl-base", steps=3, target="refine")
    stage("refine", "xl-refiner", steps=3, start=0.34, target="upscale")
    stage("upscale", "esrgan-up")
    return chain


def test_sdxl_base_refiner_upscale_chain(generation):
    answers = list(generation.ChainGenerate(_chain(), FakeGrpcContext()))
    assert len(answers) == 1
    assert answers[0].answer_id.endswith("upscale")
    img = I.decode_png(answers[0].artifacts[0].binary)
    # 64px generation through a 4x ESRGAN
    assert img.shape == (1, 256, 256, 3)
    assert np.isfinite(img).all()


def test_sdxl_refiner_uses_aesthetic_time_ids(manager):
    """The refiner preset must run the 5-time-id (aesthetic score)
    conditioning path, and produce a different denoise than the base."""
    pipe = manager.pipeline("xl-refiner")
    assert pipe.ms.config.unet.addition_time_ids == 5
    out = pipe(prompt="a castle", height=64, width=64, steps=2,
               sampler="k_euler", seeds=[3], guidance_scale=7.5)
    assert np.isfinite(np.asarray(out)).all()


def test_sdxl_chain_concurrent_clients(generation):
    """Two chains in flight at once (BASELINE config 5's 'concurrent
    multi-client batching'); both must complete with their own outputs."""
    results = {}

    def run(seed):
        answers = list(generation.ChainGenerate(_chain(seed),
                                                FakeGrpcContext()))
        results[seed] = I.decode_png(answers[0].artifacts[0].binary)

    threads = [threading.Thread(target=run, args=(s,)) for s in (21, 22)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert set(results) == {21, 22}
    for img in results.values():
        assert img.shape == (1, 256, 256, 3)
    assert np.abs(results[21] - results[22]).max() > 1e-4
