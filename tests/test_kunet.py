"""K-UNet (sd-x2 latent upscaler) tests: numeric parity of the NHWC
port + strict loader against an independent torch oracle with the
published diffusers KBlock key names (reference serves the checkpoint
through StableDiffusionLatentUpscalePipeline,
gyre/pipeline/upscalers/diffusers_upscaler_wrapper.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import kunet


def oracle(seed=0):
    torch = pytest.importorskip("torch")
    from torch_oracles import KUnet

    torch.manual_seed(seed)
    return KUnet(boc=(64, 128), layers=2, cross_dim=96, head_dim=64,
                 group_size=32).eval()


def state_numpy(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


def test_kunet_parity():
    torch = pytest.importorskip("torch")
    net = oracle()
    params, cfg = kunet.load_kunet(state_numpy(net))
    assert cfg.block_out_channels == (64, 128)
    assert cfg.in_channels == 8 and cfg.out_channels == 4
    assert cfg.attn_levels == (False, True)
    assert cfg.self_attn_levels == (False, True)

    rs = np.random.RandomState(0)
    x = rs.rand(2, 16, 16, 8).astype(np.float32) * 2 - 1
    ctx = rs.rand(2, 7, 96).astype(np.float32)
    cn = np.asarray([0.25, -0.5], np.float32)   # c_noise = 0.25*ln(sigma)
    ours = np.asarray(kunet.apply(params, cfg, jnp.asarray(x),
                                  jnp.asarray(cn), jnp.asarray(ctx)))
    with torch.no_grad():
        theirs = net(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     torch.from_numpy(cn),
                     torch.from_numpy(ctx)).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == theirs.shape == (2, 16, 16, 4)
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=2e-3)


def test_kunet_strict_key_accounting():
    net = oracle()
    state = state_numpy(net)
    state["mystery.weight"] = np.zeros((1, 1), np.float32)
    with pytest.raises(KeyError):
        kunet.load_kunet(state)
    state = state_numpy(net)
    del state["up_blocks.0.resnets.0.conv1.weight"]
    with pytest.raises(KeyError):
        kunet.load_kunet(state)


def test_kunet_init_matches_load_tree():
    """Random init produces the same tree structure the loader builds
    (weightless presets share code paths with checkpoint serving)."""
    p = kunet.init(jax.random.PRNGKey(0), kunet.X2_TEST)
    net = oracle()
    q, _ = kunet.load_kunet(state_numpy(net))

    def paths(t, pre=""):
        if isinstance(t, dict):
            out = set()
            for k, v in t.items():
                out |= paths(v, f"{pre}/{k}")
            return out
        if isinstance(t, list):
            out = set()
            for v in t:
                out |= paths(v, pre + "/*")
            return out
        return {pre}

    # same key surface modulo list lengths and optional shortcut convs
    a = {p_ for p_ in paths(p) if "conv_shortcut" not in p_}
    b = {p_ for p_ in paths(q) if "conv_shortcut" not in p_}
    assert a == b


def test_kunet_blur_resample_shapes():
    x = jnp.ones((1, 8, 8, 4))
    assert kunet._blur_down(x).shape == (1, 4, 4, 4)
    assert kunet._blur_up(x).shape == (1, 16, 16, 4)
    # blur kernels preserve the mean of a constant field
    np.testing.assert_allclose(np.asarray(kunet._blur_down(x)), 1.0,
                               atol=1e-6)
