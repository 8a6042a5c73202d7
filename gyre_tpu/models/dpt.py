"""DPT (Dense Prediction Transformer) monocular depth — the real MiDaS v3
architecture (reference depth stack: gyre/pipeline/depth/midas_model_wrapper.py
+ diffusers_depth_pipeline.py, which wrap isl-org MiDaS DPT and transformers
DPTForDepthEstimation over the same published weights).

TPU-first design notes: NHWC everywhere, ViT attention as batched einsum
(MXU), stride==kernel transposed convs as einsum+reshape (a matmul, no
gather), bilinear resizes with explicit align-corners handling to match
the published numerics. One static graph per input shape.

Checkpoint layouts consumed by load_dpt (100% key accounting):
  * transformers DPT  — "dpt.encoder.layer.N...", "neck...", "head.head..."
    (Intel/dpt-large, stabilityai/stable-diffusion-2-depth depth_estimator)
  * MiDaS dpt_large   — "pretrained.model.blocks.N...", "scratch..."
    (midas_v3_dpt_large_384 and friends with packed qkv)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

Params = dict


@dataclass(frozen=True)
class DPTConfig:
    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    mlp: int = 4096
    patch: int = 16
    hooks: tuple = (5, 11, 17, 23)      # encoder layers tapped by the neck
    neck_ch: tuple = (256, 512, 1024, 1024)
    fusion: int = 256
    grid: int = 24                      # native pos-embed grid (384/16)


DPT_LARGE = DPTConfig()
DPT_TEST = DPTConfig(hidden=32, layers=4, heads=2, mlp=64, patch=16,
                     hooks=(0, 1, 2, 3), neck_ch=(16, 24, 32, 32),
                     fusion=24, grid=4)


# ----------------------------------------------------------------- resize

def resize_bilinear(x: jax.Array, size: tuple[int, int],
                    align_corners: bool = False) -> jax.Array:
    """[B,H,W,C] bilinear resize matching torch's align_corners semantics
    (jax.image.resize only offers half-pixel centers)."""
    B, H, W, C = x.shape
    h, w = size
    if (H, W) == (h, w):
        return x
    if align_corners:
        ys = jnp.linspace(0.0, H - 1.0, h) if h > 1 else jnp.zeros((1,))
        xs = jnp.linspace(0.0, W - 1.0, w) if w > 1 else jnp.zeros((1,))
    else:
        ys = jnp.clip((jnp.arange(h) + 0.5) * (H / h) - 0.5, 0, H - 1)
        xs = jnp.clip((jnp.arange(w) + 0.5) * (W / w) - 0.5, 0, W - 1)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[None, :, None, None].astype(x.dtype)
    wx = (xs - x0)[None, None, :, None].astype(x.dtype)
    r0 = x[:, y0]
    r1 = x[:, y1]
    tl, tr = r0[:, :, x0], r0[:, :, x1]
    bl, br = r1[:, :, x0], r1[:, :, x1]
    top = tl * (1 - wx) + tr * wx
    bot = bl * (1 - wx) + br * wx
    return top * (1 - wy) + bot * wy


# ------------------------------------------------------------------- init

def _linear_init(key, din, dout, dtype):
    k1, k2 = jax.random.split(key)
    lim = 1.0 / np.sqrt(din)
    return {"w": jax.random.uniform(k1, (din, dout), dtype, -lim, lim),
            "b": jax.random.uniform(k2, (dout,), dtype, -lim, lim)}


def _conv_init(key, kh, kw, cin, cout, dtype, bias=True):
    k1, k2 = jax.random.split(key)
    lim = 1.0 / np.sqrt(cin * kh * kw)
    p = {"w": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -lim, lim)}
    if bias:
        p["b"] = jax.random.uniform(k2, (cout,), dtype, -lim, lim)
    return p


def init(key, cfg: DPTConfig = DPT_LARGE, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 16)
    h = cfg.hidden
    n_tok = cfg.grid * cfg.grid + 1
    blocks = []
    for i in range(cfg.layers):
        bk = jax.random.split(jax.random.fold_in(ks[0], i), 8)
        blocks.append({
            "ln1": {"g": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)},
            "q": _linear_init(bk[0], h, h, dtype),
            "k": _linear_init(bk[1], h, h, dtype),
            "v": _linear_init(bk[2], h, h, dtype),
            "proj": _linear_init(bk[3], h, h, dtype),
            "ln2": {"g": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)},
            "fc1": _linear_init(bk[4], h, cfg.mlp, dtype),
            "fc2": _linear_init(bk[5], cfg.mlp, h, dtype),
        })
    reassemble = []
    for i, ch in enumerate(cfg.neck_ch):
        rk = jax.random.split(jax.random.fold_in(ks[1], i), 3)
        entry = {"proj": _conv_init(rk[0], 1, 1, h, ch, dtype)}
        if i == 0:
            entry["resize"] = _conv_init(rk[1], 4, 4, ch, ch, dtype)
        elif i == 1:
            entry["resize"] = _conv_init(rk[1], 2, 2, ch, ch, dtype)
        elif i == 3:
            entry["resize"] = _conv_init(rk[1], 3, 3, ch, ch, dtype)
        reassemble.append(entry)
    fusion = []
    for i in range(4):
        fk = jax.random.split(jax.random.fold_in(ks[2], i), 5)
        f = cfg.fusion
        fusion.append({
            "proj": _conv_init(fk[0], 1, 1, f, f, dtype),
            "r1c1": _conv_init(fk[1], 3, 3, f, f, dtype),
            "r1c2": _conv_init(fk[2], 3, 3, f, f, dtype),
            "r2c1": _conv_init(fk[3], 3, 3, f, f, dtype),
            "r2c2": _conv_init(fk[4], 3, 3, f, f, dtype),
        })
    params = {
        "cls": jnp.zeros((1, 1, h), dtype),
        "pos": jax.random.normal(ks[3], (1, n_tok, h), dtype) * 0.02,
        "patch": _conv_init(ks[4], cfg.patch, cfg.patch, 3, h, dtype),
        "blocks": blocks,
        "readout": [_linear_init(jax.random.fold_in(ks[5], i), 2 * h, h,
                                 dtype) for i in range(4)],
        "reassemble": reassemble,
        "convs": [_conv_init(jax.random.fold_in(ks[6], i), 3, 3,
                             cfg.neck_ch[i], cfg.fusion, dtype, bias=False)
                  for i in range(4)],
        "fusion": fusion,
        "head": {
            "c0": _conv_init(ks[7], 3, 3, cfg.fusion, cfg.fusion // 2,
                             dtype),
            "c2": _conv_init(ks[8], 3, 3, cfg.fusion // 2, 32, dtype),
            "c4": _conv_init(ks[9], 1, 1, 32, 1, dtype),
        },
    }
    # random-init fallback must emit a varying response map: with uniform
    # +-lim biases the two head ReLUs collapse to all-zero
    params["head"]["c2"]["b"] = jnp.abs(params["head"]["c2"]["b"]) + 0.05
    params["head"]["c4"]["b"] = jnp.full_like(params["head"]["c4"]["b"],
                                              0.2)
    return params


# ------------------------------------------------------------------ apply

def _ln(p, x):
    m = x.mean(-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-12) * p["g"] + p["b"]


def _lin(p, x):
    return x @ p["w"] + p["b"]


def _conv(p, x, stride=1, pad="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"] if "b" in p else y


def _convt_k_eq_s(p, x):
    """Stride==kernel transposed conv as einsum+reshape — each input pixel
    emits an s x s block (pure matmul; MXU-shaped)."""
    kh, kw, cin, cout = p["w"].shape
    B, H, W, _ = x.shape
    y = jnp.einsum("bhwi,klio->bhwklo", x, p["w"])
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * kh, W * kw, cout)
    return y + p["b"]


def _attn(bp, x, heads):
    B, N, h = x.shape
    d = h // heads

    def split(t):
        return t.reshape(B, N, heads, d).transpose(0, 2, 1, 3)

    q = split(_lin(bp["q"], x))
    k = split(_lin(bp["k"], x))
    v = split(_lin(bp["v"], x))
    a = jnp.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(d)
    a = jax.nn.softmax(a, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", a, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, N, h)
    return _lin(bp["proj"], o)


def backbone(params: Params, x: jax.Array, cfg: DPTConfig) -> list:
    """Normalized image [B,H,W,3] -> tapped token maps (cls kept)."""
    B, H, W, _ = x.shape
    gh, gw = H // cfg.patch, W // cfg.patch
    tok = _conv(params["patch"], x, stride=cfg.patch, pad="VALID")
    tok = tok.reshape(B, gh * gw, cfg.hidden)
    cls = jnp.broadcast_to(params["cls"], (B, 1, cfg.hidden))
    seq = jnp.concatenate([cls.astype(tok.dtype), tok], axis=1)
    pos = params["pos"]
    if (gh, gw) != (cfg.grid, cfg.grid):
        # interpolate the grid part (HF _resize_pos_embed semantics)
        cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
        grid_pos = grid_pos.reshape(1, cfg.grid, cfg.grid, cfg.hidden)
        grid_pos = resize_bilinear(grid_pos, (gh, gw))
        pos = jnp.concatenate(
            [cls_pos, grid_pos.reshape(1, gh * gw, cfg.hidden)], axis=1)
    seq = seq + pos
    taps = []
    want = set(cfg.hooks)
    for i, bp in enumerate(params["blocks"]):
        seq = seq + _attn(bp, _ln(bp["ln1"], seq), cfg.heads)
        seq = seq + _lin(bp["fc2"], jax.nn.gelu(
            _lin(bp["fc1"], _ln(bp["ln2"], seq)), approximate=False))
        if i in want:
            taps.append(seq)
    return taps


def neck(params: Params, taps: list, gh: int, gw: int,
         cfg: DPTConfig, return_laterals: bool = False):
    """Tapped token maps -> fused pyramid (reference DPTNeck +
    DPTFeatureFusionStage, transformers modeling_dpt.py:495-760)."""
    feats = []
    for i, seq in enumerate(taps):
        cls, tokens = seq[:, :1], seq[:, 1:]
        B, N, h = tokens.shape
        # readout "project": concat cls onto every token, linear + gelu
        readout = jnp.broadcast_to(cls, tokens.shape)
        t = jax.nn.gelu(_lin(params["readout"][i],
                             jnp.concatenate([tokens, readout], -1)),
                        approximate=False)
        fmap = t.reshape(B, gh, gw, h)
        entry = params["reassemble"][i]
        fmap = _conv(entry["proj"], fmap)
        if i in (0, 1):
            fmap = _convt_k_eq_s(entry["resize"], fmap)
        elif i == 3:
            fmap = _conv(entry["resize"], fmap, stride=2)
        fmap = _conv({"w": params["convs"][i]["w"]}, fmap)
        feats.append(fmap)

    def res_unit(c1, c2, x):
        y = _conv(c1, jax.nn.relu(x))
        y = _conv(c2, jax.nn.relu(y))
        return x + y

    fused = None
    out = []
    for fp, lateral in zip(params["fusion"], feats[::-1]):
        if fused is None:
            fused = lateral
        else:
            res = lateral
            if fused.shape[1:3] != res.shape[1:3]:
                res = resize_bilinear(res, fused.shape[1:3])
            fused = fused + res_unit(fp["r1c1"], fp["r1c2"], res)
        fused = res_unit(fp["r2c1"], fp["r2c2"], fused)
        fused = resize_bilinear(
            fused, (fused.shape[1] * 2, fused.shape[2] * 2),
            align_corners=True)
        fused = _conv(fp["proj"], fused)
        out.append(fused)
    if return_laterals:
        return out, feats
    return out


def apply(params: Params, x: jax.Array, cfg: DPTConfig = DPT_LARGE
          ) -> jax.Array:
    """Normalized image [B,H,W,3] (H,W multiples of patch) -> relative
    inverse depth [B,H',W',1] at half input resolution."""
    return apply_features(params, x, cfg)["rel_depth"]


def apply_features(params: Params, x: jax.Array,
                   cfg: DPTConfig = DPT_LARGE) -> dict:
    """Full MidasCore-style feature surface (zoedepth
    base_models/midas.py hook points): rel_depth + the taps the ZoeDepth
    metric head consumes — l4_rn (coarsest pre-fusion lateral), r4..r1
    (fusion outputs, coarse->fine) and out_conv (the 32-channel ReLU
    activation inside the head)."""
    B, H, W, _ = x.shape
    taps = backbone(params, x, cfg)
    fused, laterals = neck(params, taps, H // cfg.patch, W // cfg.patch,
                           cfg, return_laterals=True)
    y = fused[-1]
    hp = params["head"]
    y = _conv(hp["c0"], y)
    y = resize_bilinear(y, (y.shape[1] * 2, y.shape[2] * 2),
                        align_corners=True)
    out_conv = jax.nn.relu(_conv(hp["c2"], y))
    y = jax.nn.relu(_conv(hp["c4"], out_conv))
    return {"rel_depth": y, "out_conv": out_conv,
            "l4_rn": laterals[3],
            "r4": fused[0], "r3": fused[1], "r2": fused[2],
            "r1": fused[3]}


def estimate_depth(params: Params, image: jax.Array,
                   cfg: DPTConfig = DPT_LARGE, size: int = 384) -> jax.Array:
    """Image [B,H,W,3] in 0..1 -> normalized inverse-depth hint map
    [B,H,W,1] in 0..1 (reference midas transform: resize to the native
    grid, mean/std 0.5 normalize; output min-max normalized per image)."""
    B, H, W, _ = image.shape
    x = resize_bilinear(image.astype(jnp.float32), (size, size))
    x = (x - 0.5) / 0.5
    d = apply(params, x, cfg)
    d = resize_bilinear(d, (H, W))
    lo = d.min(axis=(1, 2, 3), keepdims=True)
    hi = d.max(axis=(1, 2, 3), keepdims=True)
    return (d - lo) / jnp.maximum(hi - lo, 1e-6)


# ------------------------------------------------------------------ load

def _t_lin(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _t_conv(w):
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _t_convt(w):
    # torch ConvTranspose2d [in, out, kh, kw] -> [kh, kw, in, out]
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 0, 1))


class _Reader:
    def __init__(self, state, dtype):
        self.state = dict(state)
        self.used = set()
        self.dtype = dtype

    def __contains__(self, k):
        return k in self.state

    def get(self, k, conv=None):
        self.used.add(k)
        v = self.state[k]
        if conv is not None:
            v = conv(v)
        v = jnp.asarray(v)
        return v.astype(self.dtype) if self.dtype else v

    def lin(self, prefix):
        return {"w": self.get(prefix + ".weight", _t_lin),
                "b": self.get(prefix + ".bias")}

    def conv(self, prefix, bias=True):
        p = {"w": self.get(prefix + ".weight", _t_conv)}
        if bias and prefix + ".bias" in self.state:
            p["b"] = self.get(prefix + ".bias")
        return p

    def convt(self, prefix):
        return {"w": self.get(prefix + ".weight", _t_convt),
                "b": self.get(prefix + ".bias")}

    def norm(self, prefix):
        return {"g": self.get(prefix + ".weight"),
                "b": self.get(prefix + ".bias")}

    def finish(self, ignore=()):
        left = [k for k in self.state
                if k not in self.used and not any(k.startswith(p)
                                                  for p in ignore)]
        if left:
            raise KeyError(f"unconsumed checkpoint keys: {left[:8]}"
                           f"{'...' if len(left) > 8 else ''}")


def _default_hooks(layers: int) -> tuple:
    # published taps: every layers/4-th block's output (vit-b [2,5,8,11],
    # vit-l [5,11,17,23])
    q = layers // 4
    return tuple(q * (k + 1) - 1 for k in range(4))


def load_dpt(state: dict, dtype=None) -> tuple[Params, DPTConfig]:
    """transformers-DPT or MiDaS-DPT state dict -> (params, derived
    config). Strict: every non-buffer key must be consumed."""
    if any(k.startswith("pretrained.model.") for k in state):
        return _load_midas(state, dtype)
    return _load_hf(state, dtype)


def _load_hf(state: dict, dtype):
    r = _Reader(state, dtype)
    pos = np.asarray(state["dpt.embeddings.position_embeddings"])
    hidden = pos.shape[-1]
    grid = int(round((pos.shape[1] - 1) ** 0.5))
    patch = np.asarray(
        state["dpt.embeddings.patch_embeddings.projection.weight"]).shape[-1]
    layers = 1 + max(int(k.split(".")[3]) for k in state
                     if k.startswith("dpt.encoder.layer."))
    mlp = np.asarray(
        state["dpt.encoder.layer.0.intermediate.dense.weight"]).shape[0]
    neck_ch = tuple(
        np.asarray(state[f"neck.reassemble_stage.layers.{i}.projection"
                         ".weight"]).shape[0] for i in range(4))
    fusion = np.asarray(state["neck.convs.0.weight"]).shape[0]
    cfg = DPTConfig(hidden=hidden, layers=layers, heads=max(1, hidden // 64),
                    mlp=mlp, patch=patch, hooks=_default_hooks(layers),
                    neck_ch=neck_ch, fusion=fusion, grid=grid)

    blocks = []
    for i in range(layers):
        p = f"dpt.encoder.layer.{i}"
        blocks.append({
            "ln1": r.norm(p + ".layernorm_before"),
            "q": r.lin(p + ".attention.attention.query"),
            "k": r.lin(p + ".attention.attention.key"),
            "v": r.lin(p + ".attention.attention.value"),
            "proj": r.lin(p + ".attention.output.dense"),
            "ln2": r.norm(p + ".layernorm_after"),
            "fc1": r.lin(p + ".intermediate.dense"),
            "fc2": r.lin(p + ".output.dense"),
        })
    reassemble = []
    for i in range(4):
        p = f"neck.reassemble_stage.layers.{i}"
        entry = {"proj": r.conv(p + ".projection")}
        if i in (0, 1):
            entry["resize"] = r.convt(p + ".resize")
        elif i == 3:
            entry["resize"] = r.conv(p + ".resize")
        reassemble.append(entry)
    fusion_p = []
    for i in range(4):
        p = f"neck.fusion_stage.layers.{i}"
        fusion_p.append({
            "proj": r.conv(p + ".projection"),
            "r1c1": r.conv(p + ".residual_layer1.convolution1"),
            "r1c2": r.conv(p + ".residual_layer1.convolution2"),
            "r2c1": r.conv(p + ".residual_layer2.convolution1"),
            "r2c2": r.conv(p + ".residual_layer2.convolution2"),
        })
    params = {
        "cls": r.get("dpt.embeddings.cls_token"),
        "pos": r.get("dpt.embeddings.position_embeddings"),
        "patch": r.conv("dpt.embeddings.patch_embeddings.projection"),
        "blocks": blocks,
        "readout": [r.lin(f"neck.reassemble_stage.readout_projects.{i}.0")
                    for i in range(4)],
        "reassemble": reassemble,
        "convs": [r.conv(f"neck.convs.{i}", bias=False) for i in range(4)],
        "fusion": fusion_p,
        "head": {"c0": r.conv("head.head.0"), "c2": r.conv("head.head.2"),
                 "c4": r.conv("head.head.4")},
    }
    # dpt.layernorm is the ViT final norm — applied after the last tap, so
    # it never reaches the depth head; dpt.pooler likewise
    r.finish(ignore=("dpt.layernorm.", "dpt.pooler."))
    return params, cfg


def _load_midas(state: dict, dtype):
    r = _Reader(state, dtype)
    pos = np.asarray(state["pretrained.model.pos_embed"])
    hidden = pos.shape[-1]
    grid = int(round((pos.shape[1] - 1) ** 0.5))
    patch = np.asarray(
        state["pretrained.model.patch_embed.proj.weight"]).shape[-1]
    layers = 1 + max(int(k.split(".")[3]) for k in state
                     if k.startswith("pretrained.model.blocks."))
    mlp = np.asarray(
        state["pretrained.model.blocks.0.mlp.fc1.weight"]).shape[0]
    neck_ch = tuple(
        np.asarray(state[f"pretrained.act_postprocess{i + 1}.3.weight"]
                   ).shape[0] for i in range(4))
    fusion = np.asarray(state["scratch.layer1_rn.weight"]).shape[0]
    cfg = DPTConfig(hidden=hidden, layers=layers, heads=max(1, hidden // 64),
                    mlp=mlp, patch=patch, hooks=_default_hooks(layers),
                    neck_ch=neck_ch, fusion=fusion, grid=grid)

    def packed_qkv(prefix):
        w = np.asarray(state[prefix + ".weight"])
        b = np.asarray(state[prefix + ".bias"])
        r.used.update({prefix + ".weight", prefix + ".bias"})
        h = w.shape[1]
        out = []
        for j in range(3):
            wj = jnp.asarray(np.ascontiguousarray(
                w[j * h:(j + 1) * h].T))
            bj = jnp.asarray(b[j * h:(j + 1) * h])
            if dtype:
                wj, bj = wj.astype(dtype), bj.astype(dtype)
            out.append({"w": wj, "b": bj})
        return out

    blocks = []
    for i in range(layers):
        p = f"pretrained.model.blocks.{i}"
        q, k, v = packed_qkv(p + ".attn.qkv")
        blocks.append({
            "ln1": r.norm(p + ".norm1"), "q": q, "k": k, "v": v,
            "proj": r.lin(p + ".attn.proj"),
            "ln2": r.norm(p + ".norm2"),
            "fc1": r.lin(p + ".mlp.fc1"), "fc2": r.lin(p + ".mlp.fc2"),
        })
    reassemble = []
    for i in range(4):
        p = f"pretrained.act_postprocess{i + 1}"
        entry = {"proj": r.conv(p + ".3")}
        if i in (0, 1):
            entry["resize"] = r.convt(p + ".4")
        elif i == 3:
            entry["resize"] = r.conv(p + ".4")
        reassemble.append(entry)
    fusion_p = []
    for i in range(4):
        # refinenet4 is the deepest (first fused) — our fusion[0]
        p = f"scratch.refinenet{4 - i}"
        fusion_p.append({
            "proj": r.conv(p + ".out_conv"),
            "r1c1": r.conv(p + ".resConfUnit1.conv1"),
            "r1c2": r.conv(p + ".resConfUnit1.conv2"),
            "r2c1": r.conv(p + ".resConfUnit2.conv1"),
            "r2c2": r.conv(p + ".resConfUnit2.conv2"),
        })
    params = {
        "cls": r.get("pretrained.model.cls_token"),
        "pos": r.get("pretrained.model.pos_embed"),
        "patch": r.conv("pretrained.model.patch_embed.proj"),
        "blocks": blocks,
        "readout": [r.lin(f"pretrained.act_postprocess{i + 1}.0.project.0")
                    for i in range(4)],
        "reassemble": reassemble,
        "convs": [r.conv(f"scratch.layer{i + 1}_rn", bias=False)
                  for i in range(4)],
        "fusion": fusion_p,
        "head": {"c0": r.conv("scratch.output_conv.0"),
                 "c2": r.conv("scratch.output_conv.2"),
                 "c4": r.conv("scratch.output_conv.4")},
    }
    r.finish(ignore=("pretrained.model.norm.",))
    return params, cfg
