"""HAT (Hybrid Attention Transformer) super-resolution in JAX — full-size,
weight-loadable from the published XPixelGroup checkpoints (HAT / HAT-L;
the reference serves these via gyre/pipeline/upscalers/models/hat_arch.py
+ upscaler_loader.py).

Topology per the paper (Chen et al. 2023): residual hybrid attention
groups, each = N hybrid attention blocks (shifted-window attention running
in parallel with a channel-attention conv branch) + one overlapping
cross-attention block (queries from normal windows, keys/values from
overlapping windows) + a conv. Pixel-shuffle upsampling.

The architecture config is DERIVED from checkpoint tensor shapes
(`load_hat`), and loading is strict: every non-buffer key must be
consumed. NHWC; windows fold into the batch axis for the MXU.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L
from .swinir import (_Tracked, _cnv, _lin, _nrm, _pixel_shuffle,
                     _rel_pos_index, _window_partition, _window_reverse)

logger = logging.getLogger(__name__)

Params = dict

_BUFFER_TOKENS = ("attn_mask", "relative_position_index", "mean")


@dataclass(frozen=True)
class HATConfig:
    embed_dim: int = 180
    depths: tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    heads: tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    window: int = 16
    mlp_ratio: float = 2.0
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    scale: int = 4
    num_feat: int = 64
    patch_norm: bool = True
    img_range: float = 1.0
    mean: tuple[float, ...] = (0.4488, 0.4371, 0.4040)
    in_ch: int = 3
    out_ch: int = 3

    @property
    def overlap_win(self) -> int:
        return self.window + int(self.overlap_ratio * self.window)


HAT_M = HATConfig()
HAT_L = HATConfig(depths=(6,) * 12, heads=(6,) * 12)
HAT_TEST = HATConfig(embed_dim=12, depths=(2, 2), heads=(2, 2), window=4,
                     compress_ratio=3, squeeze_factor=4, num_feat=8,
                     overlap_ratio=0.5)


def _rpi_oca(ws: int, wse: int) -> np.ndarray:
    """Relative position index between ws x ws query windows and wse x wse
    overlapping key windows. The published arithmetic shifts by
    ws - wse + 1, which leaves NEGATIVE indices that wrap around the bias
    table (python semantics) — the models were trained that way, so we
    reproduce it with an explicit modulo (jit-safe)."""
    co = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                              indexing="ij")).reshape(2, -1)
    ce = np.stack(np.meshgrid(np.arange(wse), np.arange(wse),
                              indexing="ij")).reshape(2, -1)
    rel = (ce[:, None, :] - co[:, :, None]).transpose(1, 2, 0) \
        .astype(np.int64)                          # ws*ws, wse*wse, 2
    rel += ws - wse + 1
    idx = rel[..., 0] * (ws + wse - 1) + rel[..., 1]
    return (idx % ((ws + wse - 1) ** 2)).astype(np.int32)


def _block_init(key, cfg: HATConfig, heads, dtype):
    d = cfg.embed_dim
    mlp_hidden = int(d * cfg.mlp_ratio)
    ks = jax.random.split(key, 10)
    dc = max(d // cfg.compress_ratio, 1)
    ds = max(d // cfg.squeeze_factor, 1)
    return {
        "ln1": L.norm_init(d, dtype),
        "qkv": L.linear_init(ks[0], d, d * 3, dtype),
        "proj": L.linear_init(ks[1], d, d, dtype),
        "rpb": jax.random.normal(
            ks[2], ((2 * cfg.window - 1) ** 2, heads), dtype) * 0.02,
        "cab": {
            "c1": L.conv_init(ks[3], 3, 3, d, dc, dtype),
            "c2": L.conv_init(ks[4], 3, 3, dc, d, dtype),
            "sq1": L.conv_init(ks[5], 1, 1, d, ds, dtype),
            "sq2": L.conv_init(ks[6], 1, 1, ds, d, dtype),
        },
        "ln2": L.norm_init(d, dtype),
        "fc1": L.linear_init(ks[7], d, mlp_hidden, dtype),
        "fc2": L.linear_init(ks[8], mlp_hidden, d, dtype),
    }


def _ocab_init(key, cfg: HATConfig, heads, dtype):
    d = cfg.embed_dim
    mlp_hidden = int(d * cfg.mlp_ratio)
    ks = jax.random.split(key, 6)
    return {
        "ln1": L.norm_init(d, dtype),
        "qkv": L.linear_init(ks[0], d, d * 3, dtype),
        "proj": L.linear_init(ks[1], d, d, dtype),
        "rpb": jax.random.normal(
            ks[2], ((cfg.window + cfg.overlap_win - 1) ** 2, heads),
            dtype) * 0.02,
        "ln2": L.norm_init(d, dtype),
        "fc1": L.linear_init(ks[3], d, mlp_hidden, dtype),
        "fc2": L.linear_init(ks[4], mlp_hidden, d, dtype),
    }


def init(key, cfg: HATConfig = HAT_TEST, dtype=jnp.float32) -> Params:
    d, nf = cfg.embed_dim, cfg.num_feat
    ks = iter(jax.random.split(key, sum(cfg.depths) + 3 * len(cfg.depths)
                               + 12))
    p: Params = {
        "conv_first": L.conv_init(next(ks), 3, 3, cfg.in_ch, d, dtype),
        "groups": [],
        "norm": L.norm_init(d, dtype),
        "conv_body": L.conv_init(next(ks), 3, 3, d, d, dtype),
        "conv_before_upsample": L.conv_init(next(ks), 3, 3, d, nf, dtype),
        "conv_last": L.conv_init(next(ks), 3, 3, nf, cfg.out_ch, dtype),
    }
    if cfg.patch_norm:
        p["patch_norm"] = L.norm_init(d, dtype)
    ups = []
    s = cfg.scale
    while s > 1:
        r = 3 if s % 3 == 0 else 2
        ups.append(L.conv_init(next(ks), 3, 3, nf, nf * r * r, dtype))
        s //= r
    p["upsample"] = ups
    for gi, depth in enumerate(cfg.depths):
        p["groups"].append({
            "blocks": [_block_init(next(ks), cfg, cfg.heads[gi], dtype)
                       for _ in range(depth)],
            "ocab": _ocab_init(next(ks), cfg, cfg.heads[gi], dtype),
            "conv": L.conv_init(next(ks), 3, 3, d, d, dtype),
        })
    return p


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _cab(p, x):
    """Channel attention block on the full feature map."""
    h = L.conv2d(p["c2"], _gelu(L.conv2d(p["c1"], x)))
    y = jnp.mean(h, axis=(1, 2), keepdims=True)
    y = jax.nn.sigmoid(L.conv2d(p["sq2"], jax.nn.relu(L.conv2d(p["sq1"], y))))
    return h * y


def _window_attention(p, wins, heads, rel_idx, mask=None):
    n, t, c = wins.shape
    qkv = L.linear(p["qkv"], wins).reshape(n, t, 3, heads, c // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = (c // heads) ** -0.5
    attn = jnp.einsum("nthd,nshd->nhts", q, k,
                      preferred_element_type=jnp.float32) * scale
    bias = p["rpb"][rel_idx.reshape(-1)].reshape(t, t, heads)
    attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn + jnp.tile(mask[:, None], (n // nw, 1, 1, 1)) \
            .astype(attn.dtype)
    probs = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("nhts,nshd->nthd", probs, v).reshape(n, t, c)
    return L.linear(p["proj"], out)


def _shift_mask(h, w, window, shift):
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift),
               slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img_mask[:, hs, ws] = cnt
            cnt += 1
    mw = _window_partition(jnp.asarray(img_mask), window)[..., 0]
    return jnp.where(mw[:, None, :] != mw[:, :, None], -100.0, 0.0)


def _hab(p, x, cfg: HATConfig, heads, shift, rel_idx, mask):
    shortcut = x
    xn = L.layer_norm(p["ln1"], x)
    conv_x = _cab(p["cab"], xn)
    if shift:
        xn = jnp.roll(xn, (-shift, -shift), axis=(1, 2))
    b, h, w, c = xn.shape
    wins = _window_partition(xn, cfg.window)
    out = _window_attention(p, wins, heads, rel_idx,
                            mask if shift else None)
    out = _window_reverse(out, cfg.window, h, w)
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    x = shortcut + out + conv_x * cfg.conv_scale
    h2 = L.layer_norm(p["ln2"], x)
    return x + L.linear(p["fc2"], _gelu(L.linear(p["fc1"], h2)))


def _overlap_kv_windows(kv, ws, wse):
    """[B,H,W,C] -> [B*nW, wse*wse, C] overlapping windows (stride ws,
    size wse, zero-padded), window order row-major per batch row —
    matching torch nn.Unfold + the reference's rearrange."""
    p = (wse - ws) // 2
    b, h, w, c = kv.shape
    kvp = jnp.pad(kv, [(0, 0), (p, p), (p, p), (0, 0)])
    # extract patches via conv_general_dilated_patches on NHWC
    patches = jax.lax.conv_general_dilated_patches(
        kvp, filter_shape=(wse, wse), window_strides=(ws, ws),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    nh, nw = patches.shape[1], patches.shape[2]
    # feature dim ordering is (c, kh, kw) — channel slowest
    patches = patches.reshape(b, nh * nw, c, wse * wse)
    return patches.transpose(0, 1, 3, 2).reshape(b * nh * nw, wse * wse, c)


def _ocab(p, x, cfg: HATConfig, heads, rel_idx):
    b, h, w, c = x.shape
    shortcut = x
    xn = L.layer_norm(p["ln1"], x)
    qkv = L.linear(p["qkv"], xn)                  # [B,H,W,3C]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    ws, wse = cfg.window, cfg.overlap_win
    q_wins = _window_partition(q, ws)             # [B*nW, ws*ws, C]
    k_wins = _overlap_kv_windows(k, ws, wse)
    v_wins = _overlap_kv_windows(v, ws, wse)
    n, nq, _ = q_wins.shape
    nk = k_wins.shape[1]
    hd = c // heads
    qh = q_wins.reshape(n, nq, heads, hd)
    kh = k_wins.reshape(n, nk, heads, hd)
    vh = v_wins.reshape(n, nk, heads, hd)
    attn = jnp.einsum("nqhd,nkhd->nhqk", qh, kh,
                      preferred_element_type=jnp.float32) * hd ** -0.5
    bias = p["rpb"][rel_idx.reshape(-1)].reshape(nq, nk, heads)
    attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
    probs = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", probs, vh).reshape(n, nq, c)
    out = _window_reverse(out, ws, h, w)
    x = shortcut + L.linear(p["proj"], out)
    h2 = L.layer_norm(p["ln2"], x)
    return x + L.linear(p["fc2"], _gelu(L.linear(p["fc1"], h2)))


def apply(params: Params, x: jax.Array, cfg: HATConfig = HAT_TEST,
          scale: int | None = None) -> jax.Array:
    """x [B,H,W,3] in [0,1] -> [B,sH,sW,3]."""
    scale = cfg.scale if scale is None else scale
    b, h0, w0, _ = x.shape
    ph = (cfg.window - h0 % cfg.window) % cfg.window
    pw = (cfg.window - w0 % cfg.window) % cfg.window
    if ph or pw:
        x = jnp.pad(x, [(0, 0), (0, ph), (0, pw), (0, 0)], mode="reflect")
    mean = jnp.asarray(cfg.mean, x.dtype).reshape(1, 1, 1, -1)
    x = (x - mean) * cfg.img_range

    rel_sa = jnp.asarray(_rel_pos_index(cfg.window))
    rel_oca = jnp.asarray(_rpi_oca(cfg.window, cfg.overlap_win))
    h, w = x.shape[1], x.shape[2]
    mask = _shift_mask(h, w, cfg.window, cfg.window // 2)

    feat = L.conv2d(params["conv_first"], x)
    body = feat
    if "patch_norm" in params:
        body = L.layer_norm(params["patch_norm"], body)
    for gi, group in enumerate(params["groups"]):
        g_in = body
        for i, blk in enumerate(group["blocks"]):
            body = _hab(blk, body, cfg, cfg.heads[gi],
                        (cfg.window // 2) if i % 2 else 0, rel_sa, mask)
        body = _ocab(group["ocab"], body, cfg, cfg.heads[gi], rel_oca)
        body = L.conv2d(group["conv"], body) + g_in
    body = L.layer_norm(params["norm"], body)
    feat = L.conv2d(params["conv_body"], body) + feat

    feat = jax.nn.leaky_relu(
        L.conv2d(params["conv_before_upsample"], feat), 0.01)
    s = cfg.scale
    for conv in params["upsample"]:
        r = 3 if s % 3 == 0 else 2
        feat = _pixel_shuffle(L.conv2d(conv, feat), r)
        s //= r
    out = L.conv2d(params["conv_last"], feat)
    out = out / cfg.img_range + mean
    return jnp.clip(out[:, :h0 * scale, :w0 * scale], 0.0, 1.0)


# ----------------------------------------------------------------- loading


def derive_config(state: dict) -> HATConfig:
    embed_dim = int(np.asarray(state["conv_first.weight"]).shape[0])
    in_ch = int(np.asarray(state["conv_first.weight"]).shape[1])
    n_groups = 0
    while f"layers.{n_groups}.residual_group.blocks.0.norm1.weight" in state:
        n_groups += 1
    depths, heads = [], []
    for g in range(n_groups):
        d = 0
        while f"layers.{g}.residual_group.blocks.{d}.norm1.weight" in state:
            d += 1
        depths.append(d)
        rpb = np.asarray(state[f"layers.{g}.residual_group.blocks.0.attn."
                               "relative_position_bias_table"])
        heads.append(int(rpb.shape[1]))
    window = (int(round(rpb.shape[0] ** 0.5)) + 1) // 2
    oca_rpb = np.asarray(state["layers.0.residual_group.overlap_attn."
                               "relative_position_bias_table"])
    wse = int(round(oca_rpb.shape[0] ** 0.5)) + 1 - window
    overlap_ratio = (wse - window) / window
    cab0 = np.asarray(state["layers.0.residual_group.blocks.0."
                            "conv_block.cab.0.weight"])
    compress = embed_dim // int(cab0.shape[0])
    sq = np.asarray(state["layers.0.residual_group.blocks.0."
                          "conv_block.cab.3.attention.1.weight"])
    squeeze = embed_dim // int(sq.shape[0])
    fc1 = np.asarray(state["layers.0.residual_group.blocks.0.mlp.fc1."
                           "weight"])
    mlp_ratio = fc1.shape[0] / embed_dim
    num_feat = int(np.asarray(
        state["conv_before_upsample.0.weight"]).shape[0])
    out_ch = int(np.asarray(state["conv_last.weight"]).shape[0])
    scale, i = 1, 0
    while f"upsample.{i}.weight" in state:
        r2 = np.asarray(state[f"upsample.{i}.weight"]).shape[0] // num_feat
        scale *= int(round(r2 ** 0.5))
        i += 2
    mean = tuple(np.asarray(state["mean"]).reshape(-1).tolist()) \
        if "mean" in state and np.asarray(state["mean"]).size == 3 \
        else (0.4488, 0.4371, 0.4040)
    return HATConfig(embed_dim=embed_dim, depths=tuple(depths),
                     heads=tuple(heads), window=window,
                     mlp_ratio=mlp_ratio, compress_ratio=compress,
                     squeeze_factor=squeeze, overlap_ratio=overlap_ratio,
                     scale=scale, num_feat=num_feat,
                     patch_norm="patch_embed.norm.weight" in state,
                     mean=mean, in_ch=in_ch, out_ch=out_ch)


def load_hat(state: dict, dtype=None,
             strict: bool = True) -> tuple[Params, HATConfig]:
    """XPixelGroup HAT checkpoint -> (params, derived config); strict key
    consumption like load_swinir."""
    if "params" in state and isinstance(state["params"], dict):
        state = state["params"]
    if "params_ema" in state and isinstance(state["params_ema"], dict):
        state = state["params_ema"]
    cfg = derive_config(state)
    st = _Tracked(state)
    p: Params = {
        "conv_first": _cnv(st, "conv_first", dtype),
        "norm": _nrm(st, "norm", dtype),
        "conv_body": _cnv(st, "conv_after_body", dtype),
        "conv_before_upsample": _cnv(st, "conv_before_upsample.0", dtype),
        "conv_last": _cnv(st, "conv_last", dtype),
        "groups": [],
    }
    if cfg.patch_norm:
        p["patch_norm"] = _nrm(st, "patch_embed.norm", dtype)
    ups, i = [], 0
    while f"upsample.{i}.weight" in state:
        ups.append(_cnv(st, f"upsample.{i}", dtype))
        i += 2
    p["upsample"] = ups
    for g, depth in enumerate(cfg.depths):
        blocks = []
        for bi in range(depth):
            bp = f"layers.{g}.residual_group.blocks.{bi}"
            blocks.append({
                "ln1": _nrm(st, f"{bp}.norm1", dtype),
                "qkv": _lin(st, f"{bp}.attn.qkv", dtype),
                "proj": _lin(st, f"{bp}.attn.proj", dtype),
                "rpb": jnp.asarray(np.asarray(
                    st[f"{bp}.attn.relative_position_bias_table"]), dtype),
                "cab": {
                    "c1": _cnv(st, f"{bp}.conv_block.cab.0", dtype),
                    "c2": _cnv(st, f"{bp}.conv_block.cab.2", dtype),
                    "sq1": _cnv(st, f"{bp}.conv_block.cab.3.attention.1",
                                dtype),
                    "sq2": _cnv(st, f"{bp}.conv_block.cab.3.attention.3",
                                dtype),
                },
                "ln2": _nrm(st, f"{bp}.norm2", dtype),
                "fc1": _lin(st, f"{bp}.mlp.fc1", dtype),
                "fc2": _lin(st, f"{bp}.mlp.fc2", dtype),
            })
        op = f"layers.{g}.residual_group.overlap_attn"
        ocab = {
            "ln1": _nrm(st, f"{op}.norm1", dtype),
            "qkv": _lin(st, f"{op}.qkv", dtype),
            "proj": _lin(st, f"{op}.proj", dtype),
            "rpb": jnp.asarray(np.asarray(
                st[f"{op}.relative_position_bias_table"]), dtype),
            "ln2": _nrm(st, f"{op}.norm2", dtype),
            "fc1": _lin(st, f"{op}.mlp.fc1", dtype),
            "fc2": _lin(st, f"{op}.mlp.fc2", dtype),
        }
        p["groups"].append({"blocks": blocks, "ocab": ocab,
                            "conv": _cnv(st, f"layers.{g}.conv", dtype)})

    leftover = {k for k in state if k not in st.used and
                not any(tok in k for tok in _BUFFER_TOKENS)}
    if leftover:
        msg = f"hat loader left {len(leftover)} keys unconsumed: " + \
            ", ".join(sorted(leftover)[:8])
        if strict:
            raise KeyError(msg)
        logger.warning(msg)
    return p, cfg
