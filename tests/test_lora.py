"""LoRA/LyCORIS/TI weight-transform tests (synthetic checkpoints)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gyre_tpu.models import configs, unet
from gyre_tpu.models.modelset import random_modelset
from gyre_tpu.pipeline import lora as L


def _kohya_lora_state(rank=4, dim_q=32, alpha=2.0):
    rs = np.random.RandomState(0)
    return {
        # level-0 attn block 0, attn1 to_q  (dim 32 in the test config)
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_down.weight": rs.randn(rank, dim_q).astype(np.float32) * 0.1,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_up.weight": rs.randn(dim_q, rank).astype(np.float32) * 0.1,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".alpha": np.float32(alpha),
        # text encoder layer 0 q_proj (dim 64)
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj"
        ".lora_down.weight": rs.randn(rank, 64).astype(np.float32) * 0.1,
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj"
        ".lora_up.weight": rs.randn(64, rank).astype(np.float32) * 0.1,
    }


def test_detect_formats():
    assert L.detect_lora_format(_kohya_lora_state()) == "kohya"
    assert L.detect_lora_format(
        {"unet.down_blocks.0.attentions.0.x.lora_A.weight": 0}) == "diffusers"
    assert L.detect_lora_format({"m.hada_w1_a": 0}) == "lycoris"


def test_apply_kohya_lora():
    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    state = _kohya_lora_state()
    new_unet, new_te, n = L.apply_lora(ms.unet_params, ms.text_params, state,
                                       scale=1.0)
    assert n == 2
    old = ms.unet_params["down"][0]["attns"][0]["blocks"][0]["attn1"]["q"]["w"]
    new = new_unet["down"][0]["attns"][0]["blocks"][0]["attn1"]["q"]["w"]
    up = state["lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
                "_attn1_to_q.lora_up.weight"]
    down = state["lora_unet_down_blocks_0_attentions_0_transformer_blocks_0"
                  "_attn1_to_q.lora_down.weight"]
    expected = np.asarray(old) + ((up @ down) * (2.0 / 4)).T
    np.testing.assert_allclose(np.asarray(new), expected, atol=1e-5)
    # untouched leaves shared, not copied
    assert new_unet["conv_in"]["w"] is ms.unet_params["conv_in"]["w"]
    # te applied
    assert not np.allclose(
        np.asarray(new_te[0]["blocks"][0]["attn"]["q"]["w"]),
        np.asarray(ms.text_params[0]["blocks"][0]["attn"]["q"]["w"]))


def test_named_weights_per_model_scales():
    """Per-model scale dict: 'unet'/'text_encoder' override '*', the
    unnamed tower falls back to '*' (reference
    gyre/services/generate.py:835-847, unified_pipeline.py:2221-2233)."""
    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    state = _kohya_lora_state()

    def leaves(scale):
        u, te, n = L.apply_lora(ms.unet_params, ms.text_params, state,
                                scale=scale)
        assert n == 2
        return (np.asarray(u["down"][0]["attns"][0]["blocks"][0]
                           ["attn1"]["q"]["w"]),
                np.asarray(te[0]["blocks"][0]["attn"]["q"]["w"]))

    u_half, te_half = leaves(0.5)
    u_full, te_full = leaves(1.0)
    # unet scaled 0.5, te scaled 1.0
    u, te = leaves({"*": 0.5, "text_encoder": 1.0})
    np.testing.assert_allclose(u, u_half, atol=1e-6)
    np.testing.assert_allclose(te, te_full, atol=1e-6)
    # named entry only: the other tower defaults to 1.0
    u, te = leaves({"unet": 0.5})
    np.testing.assert_allclose(u, u_half, atol=1e-6)
    np.testing.assert_allclose(te, te_full, atol=1e-6)
    # zero on one tower disables just that tower
    u, te = leaves({"*": 1.0, "unet": 0.0})
    np.testing.assert_allclose(
        u, np.asarray(ms.unet_params["down"][0]["attns"][0]["blocks"][0]
                      ["attn1"]["q"]["w"]), atol=1e-6)
    np.testing.assert_allclose(te, te_full, atol=1e-6)


def test_lora_scale_composes():
    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    state = _kohya_lora_state()
    u1, _, _ = L.apply_lora(ms.unet_params, ms.text_params, state, scale=0.5)
    u2, _, _ = L.apply_lora(ms.unet_params, ms.text_params, state, scale=1.0)
    old = np.asarray(
        ms.unet_params["down"][0]["attns"][0]["blocks"][0]["attn1"]["q"]["w"])
    d1 = np.asarray(
        u1["down"][0]["attns"][0]["blocks"][0]["attn1"]["q"]["w"]) - old
    d2 = np.asarray(
        u2["down"][0]["attns"][0]["blocks"][0]["attn1"]["q"]["w"]) - old
    np.testing.assert_allclose(d2, 2 * d1, atol=1e-5)


def test_loha_delta():
    rs = np.random.RandomState(1)
    r, din, dout = 2, 8, 8
    entry = {
        "hada_w1_a": rs.randn(dout, r).astype(np.float32),
        "hada_w1_b": rs.randn(r, din).astype(np.float32),
        "hada_w2_a": rs.randn(dout, r).astype(np.float32),
        "hada_w2_b": rs.randn(r, din).astype(np.float32),
        "alpha": np.float32(2.0),
    }
    delta = L._rebuild_delta(entry)
    expected = (entry["hada_w1_a"] @ entry["hada_w1_b"]) * \
        (entry["hada_w2_a"] @ entry["hada_w2_b"]) * (2.0 / 2)
    np.testing.assert_allclose(delta, expected, atol=1e-6)


def test_lokr_delta():
    rs = np.random.RandomState(2)
    w1 = rs.randn(2, 2).astype(np.float32)
    w2 = rs.randn(4, 4).astype(np.float32)
    delta = L._rebuild_delta({"lokr_w1": w1, "lokr_w2": w2,
                              "alpha": np.float32(2.0), "_rank": 2})
    np.testing.assert_allclose(delta, np.kron(w1, w2), atol=1e-6)


def test_conv_lora_delta():
    rs = np.random.RandomState(3)
    down = rs.randn(4, 8, 3, 3).astype(np.float32)
    up = rs.randn(16, 4, 1, 1).astype(np.float32)
    delta = L._rebuild_delta({"lora_up": up, "lora_down": down})
    assert delta.shape == (16, 8, 3, 3)


def test_textual_inversion():
    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    vocab = ms.text_params[0]["token_embedding"].shape[0]
    emb = {"<concept>": np.random.RandomState(0)
           .randn(2, 64).astype(np.float32)}
    new_te, tok = L.apply_textual_inversions(ms, emb)
    assert new_te[0]["token_embedding"].shape[0] == vocab + 2
    ids = tok.encode("a photo of <concept> here")
    assert vocab in ids and vocab + 1 in ids
    base_ids = tok.encode("a photo of here")
    assert all(i < vocab for i in base_ids)


def test_ti_generation_changes_output():
    from gyre_tpu.models.modelset import ModelSet
    from gyre_tpu.pipeline.unified import UnifiedPipeline

    ms = random_modelset(configs.SD_TEST, seed=0, dtype=jnp.float32)
    emb = {"<thing>": np.random.RandomState(1).randn(1, 64)
           .astype(np.float32) * 0.1}
    new_te, tok = L.apply_textual_inversions(ms, emb)
    ms2 = ModelSet(config=ms.config, unet_params=ms.unet_params,
                   vae_params=ms.vae_params, text_params=new_te,
                   tokenizer=tok, schedule=ms.schedule, id="ti")
    pipe = UnifiedPipeline(ms2, compute_dtype=jnp.float32)
    kw = dict(height=64, width=64, steps=2, sampler="k_euler", seeds=[1],
              guidance_scale=7.5)
    a = np.asarray(pipe(prompt="a <thing> photo", **kw))
    b = np.asarray(pipe(prompt="a photo", **kw))
    assert np.abs(a - b).max() > 1e-4
