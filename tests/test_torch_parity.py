"""Numeric parity against independent torch oracles (VERDICT weak #6).

The round-trip tests in test_load.py verify load/export are inverses of
each other, but both sides share the same transpose conventions; a
systematic error would cancel. Here the state dicts come from torch
modules with the published diffusers/transformers key names (written
NCHW, forward semantics independent of our JAX code), so agreement
proves the load path handles real checkpoints correctly — every
transpose, GroupNorm group ordering, GEGLU split, attention head
reshape and VAE pad convention.

Also asserts 100% state-dict key consumption (VERDICT missing #1's
"load_x consumes 100% of keys" done-criterion, applied to the core
modelset)."""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gyre_tpu.models import clip as clip_mod  # noqa: E402
from gyre_tpu.models import configs, load  # noqa: E402
from gyre_tpu.models import unet as unet_mod  # noqa: E402
from gyre_tpu.models import vae as vae_mod  # noqa: E402

import torch_oracles as oracle  # noqa: E402  (tests/ is on sys.path via rootdir conftest)

UNET_TINY = configs.UNetConfig(
    block_out_channels=(32, 64),
    layers_per_block=2,
    attn_levels=(True, True),
    transformer_layers=(1, 1),
    num_heads=(4, 4),
    cross_attention_dim=48,
    time_embed_dim=128,
    norm_groups=8,
    mid_transformer_layers=1,
)

VAE_TINY = configs.VAEConfig(
    block_out_channels=(16, 32), layers_per_block=1, norm_groups=8)


class TrackedState(dict):
    """State dict that records which keys the loader consumed."""

    def __init__(self, base):
        super().__init__(base)
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)

    def unused(self):
        return set(self) - self.used


def _np_state(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _agree(ours, theirs, tol=2e-3):
    ours = np.asarray(ours, np.float32)
    theirs = np.asarray(theirs, np.float32)
    assert ours.shape == theirs.shape
    scale = max(np.abs(theirs).max(), 1e-6)
    err = np.abs(ours - theirs).max() / scale
    assert err < tol, f"max relative error {err:.2e}"


def test_unet_matches_torch_oracle():
    torch.manual_seed(0)
    net = oracle.OracleUNet(UNET_TINY).eval()
    state = TrackedState(_np_state(net))
    params = load.load_unet_params(state, UNET_TINY)
    assert not state.unused(), f"unconsumed keys: {sorted(state.unused())}"

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 16, 4), np.float32)
    t = np.array([3.0, 700.0], np.float32)
    ctx = rng.standard_normal((2, 7, 48), np.float32)

    ours = unet_mod.apply(params, UNET_TINY, x, t, ctx)
    with torch.no_grad():
        theirs = net(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     torch.from_numpy(t),
                     torch.from_numpy(ctx)).numpy().transpose(0, 2, 3, 1)
    _agree(ours, theirs)


def test_unet_linear_projection_matches_torch_oracle():
    """SD2/SDXL topology: linear proj_in/proj_out transformer blocks."""
    cfg = dataclasses.replace(UNET_TINY, linear_projection=True)
    torch.manual_seed(2)
    net = oracle.OracleUNet(cfg).eval()
    state = TrackedState(_np_state(net))
    params = load.load_unet_params(state, cfg)
    assert not state.unused()

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 16, 16, 4), np.float32)
    t = np.array([42.0], np.float32)
    ctx = rng.standard_normal((1, 5, 48), np.float32)
    ours = unet_mod.apply(params, cfg, x, t, ctx)
    with torch.no_grad():
        theirs = net(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     torch.from_numpy(t),
                     torch.from_numpy(ctx)).numpy().transpose(0, 2, 3, 1)
    _agree(ours, theirs)


def test_vae_matches_torch_oracle():
    torch.manual_seed(4)
    net = oracle.OracleVAE(VAE_TINY).eval()
    state = TrackedState(_np_state(net))
    params = load.load_vae_params(state, VAE_TINY)
    assert not state.unused(), f"unconsumed keys: {sorted(state.unused())}"

    rng = np.random.default_rng(5)
    img = rng.standard_normal((1, 32, 32, 3), np.float32) * 0.5
    mean, logvar = vae_mod.encode(params, VAE_TINY, img)
    with torch.no_grad():
        tmean, tlogvar = net.encode(torch.from_numpy(
            img.transpose(0, 3, 1, 2)))
    _agree(mean, tmean.numpy().transpose(0, 2, 3, 1))
    _agree(logvar, tlogvar.numpy().transpose(0, 2, 3, 1))

    z = rng.standard_normal((1, 8, 8, 4), np.float32)
    ours = vae_mod.decode(params, VAE_TINY, z)
    with torch.no_grad():
        theirs = net.decode(torch.from_numpy(z.transpose(0, 3, 1, 2)))
    _agree(ours, theirs.numpy().transpose(0, 2, 3, 1))


def test_clip_matches_transformers():
    """The text tower against the actual transformers CLIPTextModel — the
    very class the reference loads checkpoints through."""
    tfm = pytest.importorskip("transformers")
    hf_cfg = tfm.CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu",
        eos_token_id=999, bos_token_id=998, pad_token_id=0)
    torch.manual_seed(6)
    net = tfm.CLIPTextModel(hf_cfg).eval()

    ours_cfg = configs.CLIPTextConfig(
        vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, activation="quick_gelu", eos_token_id=999)
    state = TrackedState(_np_state(net))
    params = load.load_clip_params(state, ours_cfg)
    # position_ids is a buffer in some transformers versions, not a weight
    leftovers = {k for k in state.unused()
                 if not k.endswith("position_ids")}
    assert not leftovers, f"unconsumed keys: {sorted(leftovers)}"

    ids = np.array([[998, 5, 17, 104, 999, 0, 0, 0]], np.int64)
    out = clip_mod.apply(params, ours_cfg, ids)
    with torch.no_grad():
        hf = net(torch.from_numpy(ids), output_hidden_states=True)
    _agree(out["last"], hf.last_hidden_state.numpy())
    _agree(out["pooled"], hf.pooler_output.numpy())
    # clip-skip parity: penultimate pre-final-LN hidden state
    _agree(out["hidden_states"][-2], hf.hidden_states[-2].numpy())


def test_clip_model_joint_space_matches_transformers():
    """Full CLIPModel (both towers + joint-space projections) against
    transformers' CLIPModel — the class the reference's `clip` model type
    loads guidance weights through (gyre/manager.py:1540-1560). Verifies
    load_clip_model_params' shape-derived configs and that image/text
    embeddings land in the same joint space as get_image_features /
    get_text_features."""
    tfm = pytest.importorskip("transformers")
    hf_cfg = tfm.CLIPConfig(
        projection_dim=32,
        text_config={
            "vocab_size": 1000, "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "num_attention_heads": 4, "max_position_embeddings": 77,
            "hidden_act": "quick_gelu", "eos_token_id": 999,
            "bos_token_id": 998, "pad_token_id": 0,
        },
        vision_config={
            "image_size": 32, "patch_size": 8, "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "num_attention_heads": 4, "hidden_act": "quick_gelu",
        })
    torch.manual_seed(11)
    net = tfm.CLIPModel(hf_cfg).eval()

    state = TrackedState(_np_state(net))
    text_p, text_cfg, vis_p, vis_cfg = load.load_clip_model_params(
        state, text_heads=4, vision_heads=4)
    leftovers = {k for k in state.unused()
                 if not k.endswith("position_ids")
                 and k != "logit_scale"}
    assert not leftovers, f"unconsumed keys: {sorted(leftovers)}"

    assert text_cfg.num_layers == 2 and text_cfg.projection_dim == 32
    assert vis_cfg.num_layers == 2 and vis_cfg.projection_dim == 32
    assert vis_cfg.image_size == 32 and vis_cfg.patch_size == 8

    ids = np.array([[998, 5, 17, 104, 999, 0, 0, 0]], np.int64)
    out = clip_mod.apply(text_p, text_cfg, ids)
    with torch.no_grad():
        t_feat = net.get_text_features(torch.from_numpy(ids)).numpy()
    _agree(out["pooled"], t_feat)

    rng = np.random.default_rng(3)
    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    vout = clip_mod.vision_apply(vis_p, vis_cfg, img, normalize=False)
    with torch.no_grad():
        i_feat = net.get_image_features(
            torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    _agree(vout["image_embeds"], i_feat)
