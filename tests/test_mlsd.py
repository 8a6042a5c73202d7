"""M-LSD (MobileV2_MLSD_Large) tests: numeric parity of the NHWC/BN-
folded port against an independent torch oracle with the published
``mlsd_large_512_fp32.pth`` key names, strict key accounting, and the
vectorized decode/render contract (reference vendors the torch model at
gyre/pipeline/hinters/models/mbv2_mlsd_large.py and decodes with the
annotator's numpy/cv2 loop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import mlsd


def oracle(seed=0):
    torch = pytest.importorskip("torch")
    from torch_oracles import MlsdLarge

    torch.manual_seed(seed)
    net = MlsdLarge().eval()
    # randomize BN buffers so folding is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    return net


def state_numpy(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


def test_backbone_fpn_parity():
    torch = pytest.importorskip("torch")
    net = oracle()
    params = mlsd.load_mlsd(state_numpy(net))
    x = np.random.RandomState(0).rand(2, 64, 64, 4).astype(np.float32)
    x = x * 2.0 - 1.0
    ours = np.asarray(mlsd.backbone_fpn(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    theirs = theirs.transpose(0, 2, 3, 1)[..., 7:]
    np.testing.assert_allclose(ours[..., 7:], theirs, atol=2e-3,
                               rtol=1e-3)
    assert ours.shape == (2, 32, 32, 16)


def test_strict_key_accounting():
    net = oracle()
    state = state_numpy(net)
    state["block99.conv1.0.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    with pytest.raises(KeyError):
        mlsd.load_mlsd(state)
    state = state_numpy(net)
    del state["block23.conv3.weight"]
    with pytest.raises(KeyError):
        mlsd.load_mlsd(state)
    state = state_numpy(net)
    del state["backbone.features.3.conv.1.1.running_mean"]
    with pytest.raises(KeyError):
        mlsd.load_mlsd(state)


def test_upsample_align_corners_parity():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(1).rand(1, 5, 7, 3).astype(np.float32)
    ours = np.asarray(mlsd._upsample_bilinear_ac(jnp.asarray(x)))
    theirs = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2.0,
        mode="bilinear", align_corners=True).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_detect_and_render(rng_key):
    params = mlsd.init(rng_key)
    img = jnp.asarray(
        np.random.RandomState(2).rand(1, 96, 96, 3), jnp.float32)
    segs, valid, scores = mlsd.detect(params, img, top_k=50,
                                      input_size=128)
    assert segs.shape == (1, 50, 4) and valid.shape == (1, 50)
    assert float(jnp.min(segs)) >= 0.0 and float(jnp.max(segs)) <= 1.0
    out = mlsd.apply(params, img, top_k=50, input_size=128)
    assert out.shape == (1, 96, 96, 3)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_render_segments_draws_lines():
    segs = jnp.asarray([[[0.1, 0.5, 0.9, 0.5]]], jnp.float32)
    on = mlsd.render_segments(segs, jnp.ones((1, 1)), 64, 64)
    off = mlsd.render_segments(segs, jnp.zeros((1, 1)), 64, 64)
    assert float(on.sum()) > 0.0
    assert float(off.sum()) == 0.0
    # the drawn row is the midline
    assert float(on[0, 32, 32, 0]) == 1.0


def test_nms_keeps_local_maxima_only():
    heat = np.zeros((1, 16, 16), np.float32)
    heat[0, 4, 4] = 4.0
    heat[0, 4, 5] = 3.0   # suppressed by the 4,4 peak
    heat[0, 12, 12] = 5.0
    out = np.asarray(mlsd._nms_heat(jnp.asarray(heat)))
    assert out[0, 4, 4] > 0 and out[0, 12, 12] > 0
    assert out[0, 4, 5] == 0.0
