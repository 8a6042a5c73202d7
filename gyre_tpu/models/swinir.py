"""SwinIR super-resolution in JAX — full-size, weight-loadable from the
published BasicSR checkpoints (reference serves these via
gyre/pipeline/upscalers/models/network_swinir.py + upscaler_loader.py).

All released variants are covered:
  * classical SR  (upsampler='pixelshuffle',   resi='1conv', 180-dim)
  * real-world SR M (upsampler='nearest+conv', resi='1conv', 180-dim)
  * real-world SR L (upsampler='nearest+conv', resi='3conv', 240-dim, 9 groups)
  * lightweight SR (upsampler='pixelshuffledirect', 60-dim)

The architecture config is DERIVED from the checkpoint's tensor shapes and
key pattern (`load_swinir`), so `model: /path/to/SwinIR-*.pth.safetensors`
needs no manual config. Loading is strict: every checkpoint key must be
consumed (buffers like attn_mask / relative_position_index excepted).

Layout: NHWC; windows fold into the batch axis so attention runs as one
big MXU matmul.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L

logger = logging.getLogger(__name__)

Params = dict

# checkpoint keys that are recomputable buffers, not weights
_BUFFER_TOKENS = ("attn_mask", "relative_position_index", "mean")


@dataclass(frozen=True)
class SwinIRConfig:
    embed_dim: int = 180
    depths: tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    heads: tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    window: int = 8
    mlp_ratio: float = 2.0
    scale: int = 4
    upsampler: str = "nearest+conv"  # pixelshuffle|pixelshuffledirect|nearest+conv|''
    resi: str = "1conv"              # 1conv | 3conv
    num_feat: int = 64
    patch_norm: bool = True
    img_range: float = 1.0
    mean: tuple[float, ...] = (0.4488, 0.4371, 0.4040)
    in_ch: int = 3
    out_ch: int = 3


# published model presets (BasicSR releases)
SWINIR_M_REAL = SwinIRConfig()
SWINIR_L_REAL = SwinIRConfig(embed_dim=240, depths=(6,) * 9, heads=(8,) * 9,
                             resi="3conv")
SWINIR_CLASSICAL = SwinIRConfig(upsampler="pixelshuffle")
SWINIR_TEST = SwinIRConfig(embed_dim=16, depths=(2, 2), heads=(2, 2),
                           window=4, num_feat=8)


def _window_partition(x, w):
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_reverse(wins, w, h, ww):
    b = wins.shape[0] // ((h // w) * (ww // w))
    x = wins.reshape(b, h // w, ww // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, ww, -1)


def _rel_pos_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _block_init(key, dim, heads, window, mlp_hidden, dtype):
    ks = jax.random.split(key, 6)
    return {
        "ln1": L.norm_init(dim, dtype),
        "qkv": L.linear_init(ks[0], dim, dim * 3, dtype),
        "proj": L.linear_init(ks[1], dim, dim, dtype),
        "rpb": jax.random.normal(
            ks[2], ((2 * window - 1) ** 2, heads), dtype) * 0.02,
        "ln2": L.norm_init(dim, dtype),
        "fc1": L.linear_init(ks[3], dim, mlp_hidden, dtype),
        "fc2": L.linear_init(ks[4], mlp_hidden, dim, dtype),
    }


def _swin_block(p, x, heads, window, shift, rel_idx):
    b, h, w, c = x.shape
    res = x
    xn = L.layer_norm(p["ln1"], x)
    if shift:
        xn = jnp.roll(xn, (-shift, -shift), axis=(1, 2))
    wins = _window_partition(xn, window)           # [nW, w*w, C]
    n, t, _ = wins.shape
    qkv = L.linear(p["qkv"], wins).reshape(n, t, 3, heads, c // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = (c // heads) ** -0.5
    attn = jnp.einsum("nthd,nshd->nhts", q, k,
                      preferred_element_type=jnp.float32) * scale
    bias = p["rpb"][rel_idx.reshape(-1)].reshape(t, t, heads)
    attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
    # shifted windows: mask cross-boundary attention
    if shift:
        img_mask = np.zeros((1, h, w, 1), np.float32)
        cnt = 0
        for hs in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            for ws in (slice(0, -window), slice(-window, -shift),
                       slice(-shift, None)):
                img_mask[:, hs, ws] = cnt
                cnt += 1
        mw = _window_partition(jnp.asarray(img_mask), window)[..., 0]
        amask = (mw[:, None, :] != mw[:, :, None])
        nw_img = amask.shape[0]
        amask = jnp.tile(amask, (n // nw_img, 1, 1))
        attn = jnp.where(amask[:, None].astype(bool), -1e9, attn)
    probs = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("nhts,nshd->nthd", probs, v).reshape(n, t, c)
    out = L.linear(p["proj"], out)
    out = _window_reverse(out, window, h, w)
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    x = res + out
    h2 = L.layer_norm(p["ln2"], x)
    # exact (erf) GELU to match torch nn.GELU
    h2 = jax.nn.gelu(L.linear(p["fc1"], h2), approximate=False)
    return x + L.linear(p["fc2"], h2)


def _resi_conv_init(key, cfg, dtype):
    if cfg.resi == "3conv":
        ks = jax.random.split(key, 3)
        d, d4 = cfg.embed_dim, cfg.embed_dim // 4
        return {"c0": L.conv_init(ks[0], 3, 3, d, d4, dtype),
                "c1": L.conv_init(ks[1], 1, 1, d4, d4, dtype),
                "c2": L.conv_init(ks[2], 3, 3, d4, d, dtype)}
    return L.conv_init(key, 3, 3, cfg.embed_dim, cfg.embed_dim, dtype)


def _resi_conv(p, x):
    if "c0" in p:  # 3conv: conv3 -> lrelu -> conv1 -> lrelu -> conv3
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
        return L.conv2d(p["c2"], lrelu(L.conv2d(
            p["c1"], lrelu(L.conv2d(p["c0"], x)))))
    return L.conv2d(p, x)


def _pixel_shuffle(x, r):
    """torch PixelShuffle in NHWC: channel k = c*r*r + i*r + j moves to
    spatial offset (i, j) of channel c."""
    b, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)      # b, h, i, w, j, co
    return x.reshape(b, h * r, w * r, co)


def init(key, cfg: SwinIRConfig = SWINIR_M_REAL, dtype=jnp.float32) -> Params:
    mlp_hidden = int(cfg.embed_dim * cfg.mlp_ratio)
    n_keys = sum(cfg.depths) + len(cfg.depths) + 16
    ks = iter(jax.random.split(key, n_keys))
    d, nf = cfg.embed_dim, cfg.num_feat
    p: Params = {
        "conv_first": L.conv_init(next(ks), 3, 3, cfg.in_ch, d, dtype),
        "groups": [],
        "norm": L.norm_init(d, dtype),
        "conv_body": _resi_conv_init(next(ks), cfg, dtype),
    }
    if cfg.patch_norm:
        p["patch_norm"] = L.norm_init(d, dtype)
    for gi, depth in enumerate(cfg.depths):
        p["groups"].append({
            "blocks": [_block_init(next(ks), d, cfg.heads[gi], cfg.window,
                                   mlp_hidden, dtype)
                       for _ in range(depth)],
            "conv": _resi_conv_init(next(ks), cfg, dtype),
        })
    if cfg.upsampler in ("pixelshuffle", "nearest+conv"):
        p["conv_before_upsample"] = L.conv_init(next(ks), 3, 3, d, nf, dtype)
    if cfg.upsampler == "pixelshuffle":
        ups = []
        s = cfg.scale
        while s > 1:
            r = 3 if s % 3 == 0 else 2
            ups.append(L.conv_init(next(ks), 3, 3, nf, nf * r * r, dtype))
            s //= r
        p["upsample"] = ups
        p["conv_last"] = L.conv_init(next(ks), 3, 3, nf, cfg.out_ch, dtype)
    elif cfg.upsampler == "pixelshuffledirect":
        p["upsample"] = [L.conv_init(next(ks), 3, 3, d,
                                     cfg.out_ch * cfg.scale ** 2, dtype)]
    elif cfg.upsampler == "nearest+conv":
        p["conv_up1"] = L.conv_init(next(ks), 3, 3, nf, nf, dtype)
        if cfg.scale == 4:
            p["conv_up2"] = L.conv_init(next(ks), 3, 3, nf, nf, dtype)
        p["conv_hr"] = L.conv_init(next(ks), 3, 3, nf, nf, dtype)
        p["conv_last"] = L.conv_init(next(ks), 3, 3, nf, cfg.out_ch, dtype)
    else:  # denoise / artifact removal: residual conv_last at embed dim
        p["conv_last"] = L.conv_init(next(ks), 3, 3, d, cfg.out_ch, dtype)
    return p


def _features(params, cfg: SwinIRConfig, x):
    rel_idx = jnp.asarray(_rel_pos_index(cfg.window))
    if "patch_norm" in params:
        x = L.layer_norm(params["patch_norm"], x)
    for gi, group in enumerate(params["groups"]):
        g_in = x
        for i, blk in enumerate(group["blocks"]):
            x = _swin_block(blk, x, cfg.heads[gi], cfg.window,
                            (cfg.window // 2) if i % 2 else 0, rel_idx)
        x = _resi_conv(group["conv"], x) + g_in
    return L.layer_norm(params["norm"], x)


def apply(params: Params, x: jax.Array, cfg: SwinIRConfig = SWINIR_M_REAL,
          scale: int | None = None) -> jax.Array:
    """x [B,H,W,3] in [0,1] -> [B,sH,sW,3]. H/W are reflect-padded to
    window multiples and the output cropped back."""
    scale = cfg.scale if scale is None else scale
    b, h0, w0, _ = x.shape
    ph = (cfg.window - h0 % cfg.window) % cfg.window
    pw = (cfg.window - w0 % cfg.window) % cfg.window
    if ph or pw:
        x = jnp.pad(x, [(0, 0), (0, ph), (0, pw), (0, 0)], mode="reflect")
    mean = jnp.asarray(cfg.mean, x.dtype).reshape(1, 1, 1, -1)
    x = (x - mean) * cfg.img_range

    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
    # conv_before_upsample's activation is a DEFAULT-slope LeakyReLU (0.01)
    # in the published nets; only the up-path uses 0.2
    lrelu01 = lambda v: jax.nn.leaky_relu(v, 0.01)
    feat = L.conv2d(params["conv_first"], x)
    feat = _resi_conv(params["conv_body"],
                      _features(params, cfg, feat)) + feat
    if cfg.upsampler == "pixelshuffle":
        feat = lrelu01(L.conv2d(params["conv_before_upsample"], feat))
        s = cfg.scale
        for conv in params["upsample"]:
            r = 3 if s % 3 == 0 else 2
            feat = _pixel_shuffle(L.conv2d(conv, feat), r)
            s //= r
        out = L.conv2d(params["conv_last"], feat)
    elif cfg.upsampler == "pixelshuffledirect":
        out = _pixel_shuffle(L.conv2d(params["upsample"][0], feat),
                             cfg.scale)
    elif cfg.upsampler == "nearest+conv":
        feat = lrelu01(L.conv2d(params["conv_before_upsample"], feat))
        feat = lrelu(L.conv2d(params["conv_up1"],
                              L.upsample_nearest_2x(feat)))
        if "conv_up2" in params:
            feat = lrelu(L.conv2d(params["conv_up2"],
                                  L.upsample_nearest_2x(feat)))
        out = L.conv2d(params["conv_last"],
                       lrelu(L.conv2d(params["conv_hr"], feat)))
    else:  # denoise: global residual at input resolution
        out = x + L.conv2d(params["conv_last"], feat)
    out = out / cfg.img_range + mean
    return jnp.clip(out[:, :h0 * scale, :w0 * scale], 0.0, 1.0)


# ----------------------------------------------------------------- loading


def derive_config(state: dict) -> SwinIRConfig:
    """SwinIRConfig from a BasicSR checkpoint's shapes/key pattern."""
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
        rpb = np.asarray(state[
            f"layers.{g}.residual_group.blocks.0.attn."
            "relative_position_bias_table"])
        heads.append(int(rpb.shape[1]))
    window = (int(round(rpb.shape[0] ** 0.5)) + 1) // 2
    fc1 = np.asarray(state[
        "layers.0.residual_group.blocks.0.mlp.fc1.weight"])
    mlp_ratio = fc1.shape[0] / embed_dim
    resi = "3conv" if "layers.0.conv.0.weight" in state else "1conv"
    patch_norm = "patch_embed.norm.weight" in state

    if "conv_up1.weight" in state:
        upsampler = "nearest+conv"
        scale = 4 if "conv_up2.weight" in state else 2
        num_feat = int(np.asarray(state["conv_up1.weight"]).shape[0])
        out_ch = int(np.asarray(state["conv_last.weight"]).shape[0])
    elif "conv_before_upsample.0.weight" in state:
        upsampler = "pixelshuffle"
        num_feat = int(np.asarray(
            state["conv_before_upsample.0.weight"]).shape[0])
        out_ch = int(np.asarray(state["conv_last.weight"]).shape[0])
        scale = 1
        i = 0
        while f"upsample.{i}.weight" in state:
            r2 = np.asarray(state[f"upsample.{i}.weight"]).shape[0] // \
                num_feat
            scale *= int(round(r2 ** 0.5))
            i += 2
    elif "upsample.0.weight" in state:
        upsampler = "pixelshuffledirect"
        num_feat = embed_dim
        w0 = np.asarray(state["upsample.0.weight"])
        out_ch = 3
        scale = int(round((w0.shape[0] / out_ch) ** 0.5))
    else:
        upsampler, scale, num_feat = "", 1, embed_dim
        out_ch = int(np.asarray(state["conv_last.weight"]).shape[0])

    mean = tuple(np.asarray(state["mean"]).reshape(-1).tolist()) \
        if "mean" in state and np.asarray(state["mean"]).size == 3 \
        else ((0.4488, 0.4371, 0.4040) if in_ch == 3 else (0.0,))
    return SwinIRConfig(embed_dim=embed_dim, depths=tuple(depths),
                        heads=tuple(heads), window=window,
                        mlp_ratio=mlp_ratio, scale=scale,
                        upsampler=upsampler, resi=resi, num_feat=num_feat,
                        patch_norm=patch_norm, mean=mean, in_ch=in_ch,
                        out_ch=out_ch)


class _Tracked(dict):
    """State-dict wrapper recording which keys the loader consumed."""

    def __init__(self, state):
        super().__init__(state)
        self.used: set[str] = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)


def _lin(state, key, dtype=None):
    p = {"w": jnp.asarray(np.asarray(state[f"{key}.weight"]).T, dtype)}
    if f"{key}.bias" in state:
        p["b"] = jnp.asarray(np.asarray(state[f"{key}.bias"]), dtype)
    return p


def _cnv(state, key, dtype=None):
    w = np.transpose(np.asarray(state[f"{key}.weight"]), (2, 3, 1, 0))
    p = {"w": jnp.asarray(np.ascontiguousarray(w), dtype)}
    if f"{key}.bias" in state:
        p["b"] = jnp.asarray(np.asarray(state[f"{key}.bias"]), dtype)
    return p


def _nrm(state, key, dtype=None):
    return {"scale": jnp.asarray(np.asarray(state[f"{key}.weight"]), dtype),
            "bias": jnp.asarray(np.asarray(state[f"{key}.bias"]), dtype)}


def load_swinir(state: dict, dtype=None,
                strict: bool = True) -> tuple[Params, SwinIRConfig]:
    """BasicSR SwinIR checkpoint -> (params, derived config). With
    strict=True every non-buffer key must be consumed (a transposed or
    missing mapping fails loudly instead of producing garbage)."""
    if "params" in state and isinstance(state["params"], dict):
        state = state["params"]   # BasicSR .pth wrapping
    if "params_ema" in state and isinstance(state["params_ema"], dict):
        state = state["params_ema"]
    cfg = derive_config(state)
    st = _Tracked(state)
    p: Params = {
        "conv_first": _cnv(st, "conv_first", dtype),
        "norm": _nrm(st, "norm", dtype),
        "groups": [],
    }
    if cfg.patch_norm:
        p["patch_norm"] = _nrm(st, "patch_embed.norm", dtype)
    if cfg.resi == "3conv":
        p["conv_body"] = {"c0": _cnv(st, "conv_after_body.0", dtype),
                          "c1": _cnv(st, "conv_after_body.2", dtype),
                          "c2": _cnv(st, "conv_after_body.4", dtype)}
    else:
        p["conv_body"] = _cnv(st, "conv_after_body", dtype)
    for g, depth in enumerate(cfg.depths):
        blocks = []
        for i in range(depth):
            bp = f"layers.{g}.residual_group.blocks.{i}"
            blocks.append({
                "ln1": _nrm(st, f"{bp}.norm1", dtype),
                "qkv": _lin(st, f"{bp}.attn.qkv", dtype),
                "proj": _lin(st, f"{bp}.attn.proj", dtype),
                "rpb": jnp.asarray(np.asarray(
                    st[f"{bp}.attn.relative_position_bias_table"]), dtype),
                "ln2": _nrm(st, f"{bp}.norm2", dtype),
                "fc1": _lin(st, f"{bp}.mlp.fc1", dtype),
                "fc2": _lin(st, f"{bp}.mlp.fc2", dtype),
            })
        if cfg.resi == "3conv":
            conv = {"c0": _cnv(st, f"layers.{g}.conv.0", dtype),
                    "c1": _cnv(st, f"layers.{g}.conv.2", dtype),
                    "c2": _cnv(st, f"layers.{g}.conv.4", dtype)}
        else:
            conv = _cnv(st, f"layers.{g}.conv", dtype)
        p["groups"].append({"blocks": blocks, "conv": conv})
    if cfg.upsampler in ("pixelshuffle", "nearest+conv"):
        p["conv_before_upsample"] = _cnv(st, "conv_before_upsample.0",
                                         dtype)
    if cfg.upsampler == "pixelshuffle":
        ups, i = [], 0
        while f"upsample.{i}.weight" in state:
            ups.append(_cnv(st, f"upsample.{i}", dtype))
            i += 2
        p["upsample"] = ups
        p["conv_last"] = _cnv(st, "conv_last", dtype)
    elif cfg.upsampler == "pixelshuffledirect":
        p["upsample"] = [_cnv(st, "upsample.0", dtype)]
    elif cfg.upsampler == "nearest+conv":
        p["conv_up1"] = _cnv(st, "conv_up1", dtype)
        if "conv_up2.weight" in state:
            p["conv_up2"] = _cnv(st, "conv_up2", dtype)
        p["conv_hr"] = _cnv(st, "conv_hr", dtype)
        p["conv_last"] = _cnv(st, "conv_last", dtype)
    else:
        p["conv_last"] = _cnv(st, "conv_last", dtype)

    leftover = {k for k in state if k not in st.used and
                not any(tok in k for tok in _BUFFER_TOKENS)}
    if leftover:
        msg = f"swinir loader left {len(leftover)} keys unconsumed: " + \
            ", ".join(sorted(leftover)[:8])
        if strict:
            raise KeyError(msg)
        logger.warning(msg)
    return p, cfg


# resi-group conv helper is used by apply via conv_body/groups entries
def _is_3conv(p):
    return isinstance(p, dict) and "c0" in p
