"""ESRGAN model + tiled upscaler pipeline tests (tiny random model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import esrgan
from gyre_tpu.pipeline.upscaler import UpscalerPipeline


@pytest.fixture(scope="module")
def tiny_pipe():
    params = esrgan.init(jax.random.PRNGKey(0), num_blocks=2, nf=16, gc=8)
    return UpscalerPipeline(params, scale=4, tile=32, overlap=4)


def test_esrgan_shapes():
    params = esrgan.init(jax.random.PRNGKey(0), num_blocks=2, nf=16, gc=8)
    x = jnp.zeros((1, 16, 16, 3))
    out = esrgan.apply(params, x)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_esrgan_weight_roundtrip():
    """Our params export to BasicSR naming and reload identically."""
    from gyre_tpu.models.load import _inv_conv

    params = esrgan.init(jax.random.PRNGKey(1), num_blocks=2, nf=16, gc=8)
    state = {}

    def put(prefix, p):
        state[f"{prefix}.weight"] = _inv_conv(np.asarray(p["w"]))
        state[f"{prefix}.bias"] = np.asarray(p["b"])

    put("conv_first", params["conv_first"])
    for i, blk in enumerate(params["body"]):
        for r in ("rdb1", "rdb2", "rdb3"):
            for j in range(1, 6):
                put(f"body.{i}.{r}.conv{j}", blk[r][f"conv{j}"])
    for name in ("conv_body", "conv_up1", "conv_up2", "conv_hr",
                 "conv_last"):
        put(name, params[name])

    back = esrgan.load_params(state)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 8, 3))
    np.testing.assert_allclose(np.asarray(esrgan.apply(params, x)),
                               np.asarray(esrgan.apply(back, x)), atol=1e-6)


def test_tiled_upscale_matches_direct(tiny_pipe):
    """Tiling with feathered overlap ~= whole-image inference."""
    img = np.random.RandomState(0).rand(1, 48, 40, 3).astype(np.float32)
    tiled = tiny_pipe(img)
    assert tiled.shape == (1, 192, 160, 3)
    direct = np.asarray(esrgan.apply(tiny_pipe.params, jnp.asarray(img)))
    # interior agrees; borders differ slightly from reflect padding
    diff = np.abs(tiled[:, 32:-32, 32:-32] - direct[:, 32:-32, 32:-32])
    assert diff.max() < 0.05


def test_alpha_passthrough(tiny_pipe):
    img = np.random.RandomState(1).rand(1, 32, 32, 4).astype(np.float32)
    out = tiny_pipe(img)
    assert out.shape == (1, 128, 128, 4)


def test_diffusion_upscaler_x4():
    """SD-x4-style latent upscaler: 7ch unet + noise-level class embed +
    4x VAE decode."""
    from gyre_tpu.pipeline.diffusion_upscaler import DiffusionUpscaler

    up = DiffusionUpscaler.random(test=True)
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    out = np.asarray(up(img, prompt="sharp photo", steps=2, seeds=[1]))
    assert out.shape == (1, 128, 128, 3)
    assert np.isfinite(out).all()
    # prompt conditioning flows
    out2 = np.asarray(up(img, prompt="a different condition", steps=2,
                         seeds=[1]))
    assert np.abs(out - out2).max() > 1e-6


def test_upscale_request_route():
    from gyre_tpu.generated import generation_pb2 as pb
    from gyre_tpu.http.router import FakeGrpcContext
    from gyre_tpu.manager.manager import EngineManager
    from gyre_tpu.ops import images as I
    from gyre_tpu.services.generate import GenerationServiceServicer

    m = EngineManager(
        [{"id": "gen", "model": "preset/test", "default": True},
         {"id": "esrgan-x4", "task": "upscaler", "blocks": 2, "tile": 32}],
        compute_dtype=jnp.float32)
    gen = GenerationServiceServicer(m)
    req = pb.Request(engine_id="esrgan-x4")
    prompt = req.prompt.add()
    prompt.parameters.init = True
    prompt.artifact.type = pb.ARTIFACT_IMAGE
    prompt.artifact.binary = I.encode_png(
        np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32))
    answers = list(gen.Generate(req, FakeGrpcContext()))
    img = I.decode_png(answers[0].artifacts[0].binary)
    assert img.shape == (1, 128, 128, 3)


def test_manager_loads_real_swinir_checkpoint(tmp_path):
    """Engine spec pointing at a BasicSR-layout checkpoint: the manager
    resolves, derives the architecture and serves a tiled pipeline."""
    import jax
    import jax.numpy as jnp

    from gyre_tpu.manager.manager import EngineManager
    from gyre_tpu.models import swinir
    from gyre_tpu.models.load import write_safetensors

    # synthesize a checkpoint in the real torch layout via our own export
    # path: random-init tiny params -> fake torch keys (transpose back)
    cfg = swinir.SWINIR_TEST
    # tests/ is on sys.path absolutely via conftest
    from test_swinir import state_numpy, torch_swinir
    import pytest as _pytest

    try:
        net = torch_swinir(cfg)
    except BaseException:  # oracle unavailable -> skip
        _pytest.skip("torch oracle unavailable")
    path = str(tmp_path / "swinir_tiny.safetensors")
    write_safetensors(path, state_numpy(net))

    m = EngineManager(
        [{"id": "up", "task": "upscaler", "kind": "swinir", "model": path,
          "tile": 16}],
        compute_dtype=jnp.float32, batch_max=1)
    up = m.task_pipeline("upscaler", "up")
    assert up is not None
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(0),
                                        (1, 20, 24, 3)))
    out = up(img)
    assert out.shape == (1, 80, 96, 3)
    assert np.isfinite(out).all()


def test_latent_upscaler_x2():
    """sd-x2-style latent upscaler: 8ch k-upscaler unet (scale_shift time
    modulation, c_noise=0.25*ln(sigma)), 2x latent diffusion (reference
    latent-upscaler-x2 engine, config/engines/upscaler.yaml:6-15)."""
    from gyre_tpu.pipeline.diffusion_upscaler import LatentUpscalerX2

    up = LatentUpscalerX2.random(test=True)
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    out = np.asarray(up(img, prompt="sharp photo", steps=2, seeds=[1]))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()
    out2 = np.asarray(up(img, prompt="another condition", steps=2,
                         seeds=[1]))
    assert np.abs(out - out2).max() > 1e-6


def test_latent_upscaler_x2_engine_kind():
    import jax.numpy as jnp

    from gyre_tpu.manager.manager import EngineManager

    m = EngineManager(
        [{"id": "x2", "task": "upscaler", "model": "preset/upscaler-x2-test",
          "kind": "sd-x2", "steps": 2}],
        compute_dtype=jnp.float32)
    m.load_engines()
    fn = m.task_pipeline("upscaler", "x2")
    img = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32)
    out = np.asarray(fn(img))
    assert out.shape == (1, 32, 32, 3)
