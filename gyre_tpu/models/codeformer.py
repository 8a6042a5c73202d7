"""CodeFormer face restoration (Zhou et al., NeurIPS 2022) — the published
architecture, weight-loadable from the released codeformer.pth
(state-dict layout of sczhou/CodeFormer; the reference serves it from its
nonfree/ tree + facexlib crops, ~413 LoC torch).

Topology: a VQGAN autoencoder (taming-style sequential `blocks` lists:
conv-in, ResBlocks with swish/GroupNorm, AttnBlocks at 16px, strided
Downsample / nearest Upsample) + a 9-layer pre-norm transformer that
predicts codebook indices from the degraded 16x16 latent, + SFT fusion
blocks that blend encoder features into the decoder scaled by fidelity w
(w=1 max fidelity to the input, w=0 max codebook quality).

Everything is driven by a block PLAN computed from the config, so init /
load / apply share one source of truth for the sequential indices — and
the standard config reproduces the published fuse indices exactly
(asserted in tests). Loading is strict: 100% non-buffer key consumption.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L
from .swinir import _Tracked

logger = logging.getLogger(__name__)

Params = dict


@dataclass(frozen=True)
class CodeFormerConfig:
    img_size: int = 512
    nf: int = 64
    ch_mult: tuple[int, ...] = (1, 2, 2, 4, 4, 8)
    res_blocks: int = 2
    attn_resolutions: tuple[int, ...] = (16,)
    emb_dim: int = 256          # VQ latent dim
    codebook_size: int = 1024
    dim_embd: int = 512         # transformer width
    n_head: int = 8             # NOT in the state dict; published nets use 8
    n_layers: int = 9
    connect: tuple[str, ...] = ("32", "64", "128", "256")
    norm_groups: int = 32

    @property
    def latent_size(self) -> int:
        r = self.img_size // 2 ** (len(self.ch_mult) - 1)
        return r * r


CODEFORMER = CodeFormerConfig()
# norm_groups mirrors the published rule (GroupNorm(32); derivation uses
# min(32, nf)) so the tiny config follows the same derivation path
CODEFORMER_TEST = CodeFormerConfig(
    img_size=32, nf=8, ch_mult=(1, 2), res_blocks=1, attn_resolutions=(16,),
    emb_dim=16, codebook_size=32, dim_embd=32, n_head=8, n_layers=2,
    connect=("32",), norm_groups=8)


# ------------------------------------------------------------------- plans
# each plan entry: (kind, c_in, c_out, resolution_label)


def encoder_plan(cfg: CodeFormerConfig):
    plan = [("conv", 3, cfg.nf, cfg.img_size)]
    curr = cfg.img_size
    c = cfg.nf
    fuse = {}
    for i, mult in enumerate(cfg.ch_mult):
        out = cfg.nf * mult
        for _ in range(cfg.res_blocks):
            plan.append(("res", c, out, curr))
            c = out
            fuse[str(curr)] = len(plan) - 1   # last ResBlock at this res
            if curr in cfg.attn_resolutions:
                plan.append(("attn", c, c, curr))
        if i != len(cfg.ch_mult) - 1:
            plan.append(("down", c, c, curr))
            curr //= 2
    plan.append(("res", c, c, curr))
    plan.append(("attn", c, c, curr))
    plan.append(("res", c, c, curr))
    plan.append(("norm", c, c, curr))
    plan.append(("conv", c, cfg.emb_dim, curr))
    return plan, fuse


def generator_plan(cfg: CodeFormerConfig):
    c = cfg.nf * cfg.ch_mult[-1]
    curr = cfg.img_size // 2 ** (len(cfg.ch_mult) - 1)
    plan = [("conv", cfg.emb_dim, c, curr), ("res", c, c, curr),
            ("attn", c, c, curr), ("res", c, c, curr)]
    fuse = {}
    for idx, i in enumerate(reversed(range(len(cfg.ch_mult)))):
        out = cfg.nf * cfg.ch_mult[i]
        for j in range(cfg.res_blocks):
            plan.append(("res", c, out, curr))
            c = out
            # published fuse points: deepest level fuses at its LAST
            # ResBlock, every other level at its FIRST
            if (idx == 0 and j == cfg.res_blocks - 1) or (idx > 0 and j == 0):
                fuse[str(curr)] = len(plan) - 1
            if curr in cfg.attn_resolutions:
                plan.append(("attn", c, c, curr))
        if i != 0:
            plan.append(("up", c, c, curr))
            curr *= 2
    plan.append(("norm", c, c, curr))
    plan.append(("conv", c, 3, curr))
    return plan, fuse


# ------------------------------------------------------------------ blocks


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _gn(p, x, groups):
    return L.group_norm(p, x, groups=groups)


def _res_init(key, c_in, c_out, dtype):
    ks = jax.random.split(key, 3)
    p = {"norm1": L.norm_init(c_in, dtype),
         "conv1": L.conv_init(ks[0], 3, 3, c_in, c_out, dtype),
         "norm2": L.norm_init(c_out, dtype),
         "conv2": L.conv_init(ks[1], 3, 3, c_out, c_out, dtype)}
    if c_in != c_out:
        p["conv_out"] = L.conv_init(ks[2], 1, 1, c_in, c_out, dtype)
    return p


def _res_apply(p, x, groups):
    h = L.conv2d(p["conv1"], _swish(_gn(p["norm1"], x, groups)))
    h = L.conv2d(p["conv2"], _swish(_gn(p["norm2"], h, groups)))
    if "conv_out" in p:
        x = L.conv2d(p["conv_out"], x)
    return x + h


def _attn_init(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {"norm": L.norm_init(c, dtype),
            "q": L.conv_init(ks[0], 1, 1, c, c, dtype),
            "k": L.conv_init(ks[1], 1, 1, c, c, dtype),
            "v": L.conv_init(ks[2], 1, 1, c, c, dtype),
            "proj_out": L.conv_init(ks[3], 1, 1, c, c, dtype)}


def _attn_apply(p, x, groups):
    b, h, w, c = x.shape
    hn = _gn(p["norm"], x, groups)
    q = L.conv2d(p["q"], hn).reshape(b, h * w, c)
    k = L.conv2d(p["k"], hn).reshape(b, h * w, c)
    v = L.conv2d(p["v"], hn).reshape(b, h * w, c)
    attn = jnp.einsum("bqc,bkc->bqk", q, k,
                      preferred_element_type=jnp.float32) * c ** -0.5
    probs = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(b, h, w, c)
    return x + L.conv2d(p["proj_out"], out)


def _down_apply(p, x):
    # vqgan downsample: asymmetric (0,1,0,1) pad + stride-2 VALID conv
    x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
    return L.conv2d(p, x, stride=2, padding="VALID")


def _up_apply(p, x):
    return L.conv2d(p, L.upsample_nearest_2x(x))


def _block_init(key, kind, c_in, c_out, dtype):
    if kind == "conv":
        return L.conv_init(key, 3, 3, c_in, c_out, dtype)
    if kind == "res":
        return _res_init(key, c_in, c_out, dtype)
    if kind == "attn":
        return _attn_init(key, c_in, dtype)
    if kind == "down":
        return L.conv_init(key, 3, 3, c_in, c_out, dtype)
    if kind == "up":
        return L.conv_init(key, 3, 3, c_in, c_out, dtype)
    if kind == "norm":
        return L.norm_init(c_in, dtype)
    raise ValueError(kind)


def _block_apply(p, kind, x, groups):
    if kind == "conv":
        return L.conv2d(p, x)
    if kind == "res":
        return _res_apply(p, x, groups)
    if kind == "attn":
        return _attn_apply(p, x, groups)
    if kind == "down":
        return _down_apply(p, x)
    if kind == "up":
        return _up_apply(p, x)
    if kind == "norm":
        # the published sequential blocks apply the tail norm BARE (no
        # swish — nonlinearities live inside the ResBlocks)
        return _gn(p, x, groups)
    raise ValueError(kind)


def _fuse_init(key, c, dtype):
    ks = jax.random.split(key, 5)
    return {"encode_enc": _res_init(ks[0], 2 * c, c, dtype),
            "scale1": L.conv_init(ks[1], 3, 3, c, c, dtype),
            "scale2": L.conv_init(ks[2], 3, 3, c, c, dtype),
            "shift1": L.conv_init(ks[3], 3, 3, c, c, dtype),
            "shift2": L.conv_init(ks[4], 3, 3, c, c, dtype)}


def _fuse_apply(p, enc_feat, dec_feat, w, groups):
    """SFT fusion (published Fuse_sft_block): residual = w * (dec*scale +
    shift) from encoder features."""
    h = _res_apply(p["encode_enc"],
                   jnp.concatenate([enc_feat, dec_feat], axis=-1), groups)
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
    scale = L.conv2d(p["scale2"], lrelu(L.conv2d(p["scale1"], h)))
    shift = L.conv2d(p["shift2"], lrelu(L.conv2d(p["shift1"], h)))
    return dec_feat + w * (dec_feat * scale + shift)


# ------------------------------------------------------------ transformer


def _tf_layer_init(key, d, mlp, dtype):
    ks = jax.random.split(key, 4)
    return {"norm1": L.norm_init(d, dtype),
            "in_proj": L.linear_init(ks[0], d, 3 * d, dtype),
            "out_proj": L.linear_init(ks[1], d, d, dtype),
            "norm2": L.norm_init(d, dtype),
            "linear1": L.linear_init(ks[2], d, mlp, dtype),
            "linear2": L.linear_init(ks[3], mlp, d, dtype)}


def _tf_layer_apply(p, x, pos, heads):
    """Pre-norm transformer layer with learned query positions added to
    q/k only (published TransformerSALayer)."""
    b, t, d = x.shape
    hn = L.layer_norm(p["norm1"], x)
    qkv_w = p["in_proj"]["w"]         # (d, 3d)
    qkv_b = p["in_proj"]["b"]
    qk_in = hn + pos[None]
    q = qk_in @ qkv_w[:, :d] + qkv_b[:d]
    k = qk_in @ qkv_w[:, d:2 * d] + qkv_b[d:2 * d]
    v = hn @ qkv_w[:, 2 * d:] + qkv_b[2 * d:]
    hd = d // heads
    q = q.reshape(b, t, heads, hd)
    k = k.reshape(b, t, heads, hd)
    v = v.reshape(b, t, heads, hd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * hd ** -0.5
    probs = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
    x = x + L.linear(p["out_proj"], out)
    hn = L.layer_norm(p["norm2"], x)
    hn = jax.nn.gelu(L.linear(p["linear1"], hn), approximate=False)
    return x + L.linear(p["linear2"], hn)


# -------------------------------------------------------------- init/apply


def init(key, cfg: CodeFormerConfig = CODEFORMER_TEST,
         dtype=jnp.float32) -> Params:
    enc_plan, enc_fuse = encoder_plan(cfg)
    gen_plan, gen_fuse = generator_plan(cfg)
    ks = iter(jax.random.split(key, len(enc_plan) + len(gen_plan) +
                               cfg.n_layers + len(cfg.connect) + 8))
    p: Params = {
        "encoder": [_block_init(next(ks), k, ci, co, dtype)
                    for k, ci, co, _ in enc_plan],
        "generator": [_block_init(next(ks), k, ci, co, dtype)
                      for k, ci, co, _ in gen_plan],
        "codebook": jax.random.normal(
            next(ks), (cfg.codebook_size, cfg.emb_dim), dtype) * 0.05,
        "position_emb": jax.random.normal(
            next(ks), (cfg.latent_size, cfg.dim_embd), dtype) * 0.02,
        "feat_emb": L.linear_init(next(ks), cfg.emb_dim, cfg.dim_embd,
                                  dtype),
        "ft_layers": [_tf_layer_init(next(ks), cfg.dim_embd,
                                     cfg.dim_embd * 2, dtype)
                      for _ in range(cfg.n_layers)],
        "idx_norm": L.norm_init(cfg.dim_embd, dtype),
        "idx_pred": L.linear_init(next(ks), cfg.dim_embd,
                                  cfg.codebook_size, dtype, bias=False),
        "fuse": {},
    }
    chan = {str(res): co for _, _, co, res in enc_plan}
    for size in cfg.connect:
        p["fuse"][size] = _fuse_init(next(ks), chan[size], dtype)
    return p


def restore(params: Params, images: jax.Array, *, fidelity: float = 0.5,
            cfg: CodeFormerConfig = CODEFORMER_TEST) -> jax.Array:
    """images [B,H,W,3] in [0,1] (H=W=cfg.img_size) -> restored [0,1].
    fidelity = published w: 1 keeps input identity, 0 trusts the codebook."""
    g = cfg.norm_groups
    enc_plan, enc_fuse = encoder_plan(cfg)
    gen_plan, gen_fuse = generator_plan(cfg)
    x = images * 2.0 - 1.0

    enc_feats = {}
    for i, ((kind, *_), bp) in enumerate(zip(enc_plan, params["encoder"])):
        x = _block_apply(bp, kind, x, g)
        for size, idx in enc_fuse.items():
            if idx == i and size in cfg.connect:
                enc_feats[size] = x
    lq_feat = x                                        # [B,16,16,emb]

    b, hh, ww, _ = lq_feat.shape
    tokens = lq_feat.reshape(b, hh * ww, cfg.emb_dim)
    q = L.linear(params["feat_emb"], tokens)
    pos = params["position_emb"]
    for layer in params["ft_layers"]:
        q = _tf_layer_apply(layer, q, pos, cfg.n_head)
    logits = L.linear(params["idx_pred"],
                      L.layer_norm(params["idx_norm"], q))
    idx = jnp.argmax(logits, axis=-1)                  # [B, T]
    quant = params["codebook"][idx].reshape(b, hh, ww, cfg.emb_dim)

    x = quant
    for i, ((kind, *_), bp) in enumerate(zip(gen_plan,
                                             params["generator"])):
        x = _block_apply(bp, kind, x, g)
        for size, idx_f in gen_fuse.items():
            if idx_f == i and size in cfg.connect and size in enc_feats:
                x = _fuse_apply(params["fuse"][size], enc_feats[size], x,
                                fidelity, g)
    return jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)


# ----------------------------------------------------------------- loading


def derive_config(state: dict) -> CodeFormerConfig:
    nf = int(np.asarray(state["encoder.blocks.0.weight"]).shape[0])
    emb_dim = int(np.asarray(state["quantize.embedding.weight"]).shape[1])
    codebook = int(np.asarray(state["quantize.embedding.weight"]).shape[0])
    dim_embd = int(np.asarray(state["feat_emb.weight"]).shape[0])
    latent = int(np.asarray(state["position_emb"]).shape[0])
    n_layers = 0
    while f"ft_layers.{n_layers}.norm1.weight" in state:
        n_layers += 1
    connect = tuple(sorted(
        {k.split(".")[1] for k in state if k.startswith("fuse_convs_dict.")},
        key=int))
    # ch_mult / res_blocks from the encoder key pattern: ResBlock output
    # channels in sequential order, minus the two mid ResBlocks. Assumes
    # ch_mult[0] != ch_mult[1] (true for every published config).
    n_blocks = 1 + max(int(k.split(".")[2]) for k in state
                       if k.startswith("encoder.blocks."))
    outs = [int(np.asarray(state[f"encoder.blocks.{i}.conv1.weight"]
                           ).shape[0])
            for i in range(n_blocks)
            if f"encoder.blocks.{i}.norm1.weight" in state]
    level_outs = outs[:-2]
    first = level_outs[0]
    res_blocks = 0
    for o in level_outs:
        if o == first:
            res_blocks += 1
        else:
            break
    seen = []
    for j in range(0, len(level_outs), res_blocks):
        seen.append(level_outs[j] // nf)
    img_size = int(round(latent ** 0.5)) * 2 ** (len(seen) - 1)
    return CodeFormerConfig(img_size=img_size, nf=nf,
                            ch_mult=tuple(seen),
                            res_blocks=res_blocks, emb_dim=emb_dim,
                            codebook_size=codebook, dim_embd=dim_embd,
                            n_layers=n_layers, connect=connect,
                            norm_groups=min(32, nf))


def _lin_t(st, key, dtype=None, bias=True):
    p = {"w": jnp.asarray(np.asarray(st[f"{key}.weight"]).T, dtype)}
    if bias and f"{key}.bias" in st:
        p["b"] = jnp.asarray(np.asarray(st[f"{key}.bias"]), dtype)
    return p


def _cnv_t(st, key, dtype=None):
    w = np.transpose(np.asarray(st[f"{key}.weight"]), (2, 3, 1, 0))
    p = {"w": jnp.asarray(np.ascontiguousarray(w), dtype)}
    if f"{key}.bias" in st:
        p["b"] = jnp.asarray(np.asarray(st[f"{key}.bias"]), dtype)
    return p


def _nrm_t(st, key, dtype=None):
    return {"scale": jnp.asarray(np.asarray(st[f"{key}.weight"]), dtype),
            "bias": jnp.asarray(np.asarray(st[f"{key}.bias"]), dtype)}


def _load_block(st, prefix, kind, dtype):
    if kind in ("conv", "down", "up"):
        return _cnv_t(st, prefix, dtype)
    if kind == "norm":
        return _nrm_t(st, prefix, dtype)
    if kind == "res":
        p = {"norm1": _nrm_t(st, f"{prefix}.norm1", dtype),
             "conv1": _cnv_t(st, f"{prefix}.conv1", dtype),
             "norm2": _nrm_t(st, f"{prefix}.norm2", dtype),
             "conv2": _cnv_t(st, f"{prefix}.conv2", dtype)}
        if f"{prefix}.conv_out.weight" in st:
            p["conv_out"] = _cnv_t(st, f"{prefix}.conv_out", dtype)
        return p
    if kind == "attn":
        return {"norm": _nrm_t(st, f"{prefix}.norm", dtype),
                "q": _cnv_t(st, f"{prefix}.q", dtype),
                "k": _cnv_t(st, f"{prefix}.k", dtype),
                "v": _cnv_t(st, f"{prefix}.v", dtype),
                "proj_out": _cnv_t(st, f"{prefix}.proj_out", dtype)}
    raise ValueError(kind)


def load_codeformer(state: dict, dtype=None,
                    strict: bool = True) -> tuple[Params, CodeFormerConfig]:
    """sczhou/CodeFormer checkpoint -> (params, derived config)."""
    for wrap in ("params_ema", "params"):
        if wrap in state and isinstance(state[wrap], dict):
            state = state[wrap]
    cfg = derive_config(state)
    st = _Tracked(state)
    enc_plan, _ = encoder_plan(cfg)
    gen_plan, _ = generator_plan(cfg)
    # downsample convs live one level deeper ('.conv') in the torch module
    p: Params = {
        "encoder": [
            _load_block(st, f"encoder.blocks.{i}" +
                        (".conv" if kind in ("down", "up") else ""),
                        kind, dtype)
            for i, (kind, *_) in enumerate(enc_plan)],
        "generator": [
            _load_block(st, f"generator.blocks.{i}" +
                        (".conv" if kind in ("down", "up") else ""),
                        kind, dtype)
            for i, (kind, *_) in enumerate(gen_plan)],
        "codebook": jnp.asarray(
            np.asarray(st["quantize.embedding.weight"]), dtype),
        "position_emb": jnp.asarray(np.asarray(st["position_emb"]), dtype),
        "feat_emb": _lin_t(st, "feat_emb", dtype),
        "ft_layers": [],
        "idx_norm": _nrm_t(st, "idx_pred_layer.0", dtype),
        "idx_pred": _lin_t(st, "idx_pred_layer.1", dtype, bias=False),
        "fuse": {},
    }
    for i in range(cfg.n_layers):
        lp = f"ft_layers.{i}"
        p["ft_layers"].append({
            "norm1": _nrm_t(st, f"{lp}.norm1", dtype),
            "in_proj": {
                "w": jnp.asarray(
                    np.asarray(st[f"{lp}.self_attn.in_proj_weight"]).T,
                    dtype),
                "b": jnp.asarray(
                    np.asarray(st[f"{lp}.self_attn.in_proj_bias"]), dtype)},
            "out_proj": _lin_t(st, f"{lp}.self_attn.out_proj", dtype),
            "norm2": _nrm_t(st, f"{lp}.norm2", dtype),
            "linear1": _lin_t(st, f"{lp}.linear1", dtype),
            "linear2": _lin_t(st, f"{lp}.linear2", dtype),
        })
    for size in cfg.connect:
        fp = f"fuse_convs_dict.{size}"
        p["fuse"][size] = {
            "encode_enc": _load_block(st, f"{fp}.encode_enc", "res", dtype),
            "scale1": _cnv_t(st, f"{fp}.scale.0", dtype),
            "scale2": _cnv_t(st, f"{fp}.scale.2", dtype),
            "shift1": _cnv_t(st, f"{fp}.shift.0", dtype),
            "shift2": _cnv_t(st, f"{fp}.shift.2", dtype),
        }
    leftover = {k for k in state if k not in st.used and
                not k.startswith(("quantize.",))}
    if leftover:
        msg = f"codeformer loader left {len(leftover)} keys: " + \
            ", ".join(sorted(leftover)[:8])
        if strict:
            raise KeyError(msg)
        logger.warning(msg)
    return p, cfg
