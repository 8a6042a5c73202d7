"""BAE surface-normal estimation (surface_normal_uncertainty).

The reference's normal-map hinter (gyre/pipeline/hinters/
baenormal_pipeline.py over the vendored NNET, gyre/pipeline/hinters/
baenormal/): a tf_efficientnet_b5_ap encoder (torch.hub in the reference,
gyre/pipeline/hinters/baenormal/submodules/encoder.py:12) and a
UpSampleBN decoder with pixel-wise MLP refinement heads at 1/4, 1/2 and
1/1 resolution (decoder.py, test-mode path) producing (nx, ny, nz,
kappa) with norm_normalize.

TPU-first notes: NHWC throughout; the tf_* EfficientNet variants use
TF-style SAME padding, which is exactly XLA's native "SAME" — no
asymmetric-pad emulation needed; BatchNorms (eps 1e-3 in the tf
variants) fold into convs at load; the per-pixel conv1d refinement
chains are 1x1 convs over the feature map.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L

Params = dict


@dataclasses.dataclass(frozen=True)
class EffNetConfig:
    stem: int = 48
    # per stage: (channels, repeats, kernel, stride, expand)
    stages: tuple = ((24, 3, 3, 1, 1), (40, 5, 3, 2, 6), (64, 5, 5, 2, 6),
                     (128, 7, 3, 2, 6), (176, 7, 5, 1, 6),
                     (304, 9, 5, 2, 6), (512, 3, 3, 1, 6))
    head: int = 2048
    se_ratio: float = 0.25


EFFNET_B5 = EffNetConfig()
EFFNET_TEST = EffNetConfig(
    stem=8, stages=((8, 1, 3, 1, 1), (8, 1, 3, 2, 6), (8, 1, 5, 2, 6),
                    (16, 1, 3, 2, 6), (16, 1, 5, 1, 6), (24, 1, 5, 2, 6),
                    (32, 1, 3, 1, 6)), head=64)


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _conv_init(key, k, c_in, c_out, dtype, groups=1):
    return {"w": jax.random.normal(
        key, (k, k, c_in // groups, c_out), dtype) * 0.05,
        "b": jnp.zeros((c_out,), dtype)}


def _mb_init(key, c_in, c_out, k, expand, se_ratio, dtype):
    ks = iter(jax.random.split(key, 6))
    mid = c_in * expand
    se_red = max(1, int(c_in * se_ratio))
    p: Params = {}
    if expand != 1:
        p["expand"] = _conv_init(next(ks), 1, c_in, mid, dtype)
    p["dw"] = _conv_init(next(ks), k, mid, mid, dtype, groups=mid)
    p["se_reduce"] = _conv_init(next(ks), 1, mid, se_red, dtype)
    p["se_expand"] = _conv_init(next(ks), 1, se_red, mid, dtype)
    p["project"] = _conv_init(next(ks), 1, mid, c_out, dtype)
    return p


def _mb_block(p, x, k, stride, expand):
    """MBConv (folded BN): expand -> depthwise -> SE -> project, residual
    when stride 1 and channels match."""
    inp = x
    if "expand" in p:
        x = _swish(L.conv2d(p["expand"], x))
    mid = x.shape[-1]
    x = _swish(L.conv2d(p["dw"], x, stride=stride, padding="SAME",
                        feature_group_count=mid))
    se = jnp.mean(x, axis=(1, 2), keepdims=True)
    se = _swish(L.conv2d(p["se_reduce"], se))
    se = jax.nn.sigmoid(L.conv2d(p["se_expand"], se))
    x = x * se
    x = L.conv2d(p["project"], x)
    if stride == 1 and inp.shape[-1] == x.shape[-1]:
        x = x + inp
    return x


def effnet_init(key, cfg: EffNetConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 256))
    p: Params = {"stem": _conv_init(next(ks), 3, 3, cfg.stem, dtype),
                 "blocks": [],
                 "head": _conv_init(next(ks), 1, cfg.stages[-1][0],
                                    cfg.head, dtype)}
    c_prev = cfg.stem
    for (c, reps, k, stride, expand) in cfg.stages:
        stage = []
        for i in range(reps):
            stage.append(_mb_init(next(ks), c_prev if i == 0 else c,
                                  c, k, expand, cfg.se_ratio, dtype))
            c_prev = c
        p["blocks"].append(stage)
    return p


def effnet_features(params: Params, cfg: EffNetConfig, x: jax.Array):
    """x [B,H,W,3] (ImageNet-normalized) -> the 5 skip maps the BAE
    decoder consumes (reference decoder.py:100: features[4,5,6,8,11] =
    stage0 1/2, stage1 1/4, stage2 1/8, stage4 1/16, conv_head 1/32)."""
    x = _swish(L.conv2d(params["stem"], x, stride=2, padding="SAME"))
    feats = []
    for stage, (c, reps, k, stride, expand) in zip(params["blocks"],
                                                   cfg.stages):
        for i, blk in enumerate(stage):
            x = _mb_block(blk, x, k, stride if i == 0 else 1, expand)
        feats.append(x)
    head = _swish(L.conv2d(params["head"], x))
    return [feats[0], feats[1], feats[2], feats[4], head]


# ---------------------------------------------------------------- decoder


def _upsample_bn_init(key, c_in, c_out, dtype):
    ks = jax.random.split(key, 2)
    return {"conv1": _conv_init(ks[0], 3, c_in, c_out, dtype),
            "conv2": _conv_init(ks[1], 3, c_out, c_out, dtype)}


def _resize_align_true(x, size):
    """bilinear, align_corners=True (NHWC)."""
    b, h, w, c = x.shape
    if (h, w) == tuple(size):
        return x

    def grid(n_out, n_in):
        if n_out == 1:
            return jnp.zeros((1,))
        return jnp.linspace(0.0, n_in - 1.0, n_out)

    ys, xs = grid(size[0], h), grid(size[1], w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    return (x[:, y0][:, :, x0] * (1 - wy) * (1 - wx) +
            x[:, y1][:, :, x0] * wy * (1 - wx) +
            x[:, y0][:, :, x1] * (1 - wy) * wx +
            x[:, y1][:, :, x1] * wy * wx)


def _upsample_bn(p, x, skip):
    x = _resize_align_true(x, skip.shape[1:3])
    x = jnp.concatenate([x, skip], axis=-1)
    x = jax.nn.leaky_relu(L.conv2d(p["conv1"], x), 0.01)
    return jax.nn.leaky_relu(L.conv2d(p["conv2"], x), 0.01)


def _mlp_head_init(key, c_in, dtype):
    ks = jax.random.split(key, 4)
    return [_conv_init(ks[0], 1, c_in, 128, dtype),
            _conv_init(ks[1], 1, 128, 128, dtype),
            _conv_init(ks[2], 1, 128, 128, dtype),
            _conv_init(ks[3], 1, 128, 4, dtype)]


def _mlp_head(ps, x):
    for p in ps[:-1]:
        x = jax.nn.relu(L.conv2d(p, x))
    return L.conv2d(ps[-1], x)


def norm_normalize(out):
    """(nx,ny,nz,kappa) -> unit normal + positive kappa (reference
    submodules.py norm_normalize)."""
    n = out[..., :3]
    kappa = out[..., 3:]
    length = jnp.sqrt(jnp.sum(n ** 2, axis=-1, keepdims=True)) + 1e-10
    kappa = jax.nn.elu(kappa) + 1.0 + 0.01
    return jnp.concatenate([n / length, kappa], axis=-1)


def decoder_init(key, cfg: EffNetConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 16))
    chans = [s[0] for s in cfg.stages]
    f0, f1, f2, f4 = chans[0], chans[1], chans[2], chans[4]
    h = cfg.head
    d = h // 2
    return {
        "conv2": _conv_init(next(ks), 1, h, h, dtype),
        "up1": _upsample_bn_init(next(ks), h + f4, d, dtype),
        "up2": _upsample_bn_init(next(ks), d + f2, d // 2, dtype),
        "up3": _upsample_bn_init(next(ks), d // 2 + f1, d // 4, dtype),
        "up4": _upsample_bn_init(next(ks), d // 4 + f0, d // 8, dtype),
        "out_res8": _conv_init(next(ks), 3, d // 2, 4, dtype),
        "out_res4": _mlp_head_init(next(ks), d // 2 + 4, dtype),
        "out_res2": _mlp_head_init(next(ks), d // 4 + 4, dtype),
        "out_res1": _mlp_head_init(next(ks), d // 8 + 4, dtype),
    }


def decoder_apply(params: Params, feats):
    """Test-mode decoder (reference decoder.py forward, mode='test'):
    dense per-pixel refinement instead of importance sampling."""
    f0, f1, f2, f3, f4 = feats
    x_d0 = L.conv2d(params["conv2"], f4)
    x_d1 = _upsample_bn(params["up1"], x_d0, f3)
    x_d2 = _upsample_bn(params["up2"], x_d1, f2)
    x_d3 = _upsample_bn(params["up3"], x_d2, f1)
    x_d4 = _upsample_bn(params["up4"], x_d3, f0)

    out_res8 = norm_normalize(L.conv2d(params["out_res8"], x_d2))

    def refine(head, feat, prev):
        size = (feat.shape[1] * 2, feat.shape[2] * 2)
        fm = _resize_align_true(feat, size)
        ip = _resize_align_true(prev, size)
        out = _mlp_head(head, jnp.concatenate([fm, ip], axis=-1))
        return norm_normalize(out)

    out_res4 = refine(params["out_res4"], x_d2, out_res8)
    out_res2 = refine(params["out_res2"], x_d3, out_res4)
    out_res1 = refine(params["out_res1"], x_d4, out_res2)
    return [out_res8, out_res4, out_res2, out_res1]


IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)


def init(key, cfg: EffNetConfig = EFFNET_B5, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {"encoder": effnet_init(k1, cfg, dtype),
            "decoder": decoder_init(k2, cfg, dtype)}


def apply(params: Params, images: jax.Array,
          cfg: EffNetConfig = EFFNET_B5) -> jax.Array:
    """images [B,H,W,3] 0..1 -> normal map [B,H,W,3] in 0..1 (the
    reference pipeline's unit-normalised, 0.5-shifted rendering,
    baenormal_pipeline.py:38-49)."""
    b, h, w, _ = images.shape
    x = (images - jnp.asarray(IMAGE_MEAN, images.dtype)) / \
        jnp.asarray(IMAGE_STD, images.dtype)
    feats = effnet_features(params["encoder"], cfg, x)
    outs = decoder_apply(params["decoder"], feats)
    n = outs[-1][..., :3]
    n = n / jnp.sqrt(jnp.sum(n ** 2, axis=-1, keepdims=True) + 1e-12)
    n = jax.image.resize(n, (b, h, w, 3), "bilinear")
    return jnp.clip(n * 0.5 + 0.5, 0.0, 1.0)


# ----------------------------------------------------------------- loader


def _fold_bn_hwio(w, b, state, pre, eps=1e-3, depthwise=False):
    """tf_efficientnet BN (eps 1e-3) folded into an HWIO conv."""
    if f"{pre}.weight" not in state:
        return w, b
    g = np.asarray(state[f"{pre}.weight"])
    bt = np.asarray(state[f"{pre}.bias"])
    rm = np.asarray(state[f"{pre}.running_mean"])
    rv = np.asarray(state[f"{pre}.running_var"])
    s = g / np.sqrt(rv + eps)
    return w * s[None, None, None, :], (b - rm) * s + bt


def load_baenormal(state: dict, dtype=None):
    """Published BAE checkpoint (NNET state dict: encoder.original_model.*
    gen-efficientnet naming + decoder.* UpSampleBN naming, reference
    baenormal_loader.py strips the 'module.' DDP prefix upstream) ->
    (params, EffNetConfig derived from tensor shapes)."""
    from .load import _t_conv

    def j(a):
        return jnp.asarray(a, dtype) if dtype else jnp.asarray(a)

    enc = "encoder.original_model."

    def conv_bn(cpre, bnpre, depthwise=False, eps=1e-3):
        w = np.asarray(state[f"{cpre}.weight"], np.float32)
        if depthwise:
            # torch depthwise [C,1,k,k] -> HWIO [k,k,1,C]
            w = np.transpose(w, (2, 3, 1, 0))
        else:
            w = np.transpose(w, (2, 3, 1, 0))
        b = np.asarray(state.get(f"{cpre}.bias",
                                 np.zeros(w.shape[-1], np.float32)))
        if bnpre:
            w, b = _fold_bn_hwio(w, b, state, bnpre, eps=eps)
        return {"w": j(w), "b": j(b)}

    # encoder: derive stage structure from the checkpoint
    stem_w = np.asarray(state[enc + "conv_stem.weight"])
    stem = int(stem_w.shape[0])
    stages = []
    blocks_p = []
    si = 0
    while f"{enc}blocks.{si}.0.conv_dw.weight" in state or \
            f"{enc}blocks.{si}.0.conv_pw.weight" in state:
        stage_p = []
        bi = 0
        c_out = k = expand = 1
        while True:
            pre = f"{enc}blocks.{si}.{bi}"
            if f"{pre}.conv_dw.weight" not in state:
                break
            has_expand = f"{pre}.conv_pw.weight" in state and \
                f"{pre}.conv_pwl.weight" in state
            blk: Params = {}
            dw_w = np.asarray(state[f"{pre}.conv_dw.weight"])
            k = int(dw_w.shape[-1])
            mid = int(dw_w.shape[0])
            if has_expand:
                blk["expand"] = conv_bn(f"{pre}.conv_pw", f"{pre}.bn1")
                bn_dw, bn_proj, proj_key = (f"{pre}.bn2", f"{pre}.bn3",
                                            f"{pre}.conv_pwl")
            else:
                # DepthwiseSeparableConv (stage 0): dw + pw only
                bn_dw, bn_proj, proj_key = (f"{pre}.bn1", f"{pre}.bn2",
                                            f"{pre}.conv_pw")
            blk["dw"] = conv_bn(f"{pre}.conv_dw", bn_dw, depthwise=True)
            blk["se_reduce"] = conv_bn(f"{pre}.se.conv_reduce", None)
            blk["se_expand"] = conv_bn(f"{pre}.se.conv_expand", None)
            blk["project"] = conv_bn(proj_key, bn_proj)
            c_out = int(np.asarray(state[f"{proj_key}.weight"]).shape[0])
            expand = 6 if has_expand else 1
            stage_p.append(blk)
            bi += 1
        # stride per published B5 layout (stage index -> stride)
        stride = (1, 2, 2, 2, 1, 2, 1)[si] if si < 7 else 1
        stages.append((c_out, bi, k, stride, expand))
        blocks_p.append(stage_p)
        si += 1

    head = int(np.asarray(state[enc + "conv_head.weight"]).shape[0])
    cfg = EffNetConfig(stem=stem, stages=tuple(stages), head=head)
    encoder = {"stem": conv_bn(enc + "conv_stem", enc + "bn1"),
               "blocks": blocks_p,
               "head": conv_bn(enc + "conv_head", enc + "bn2")}

    # decoder (BN architecture; GN checkpoints fold the same way except
    # GroupNorm stays — detect and reject GN for now)
    def dec_conv(cpre, bnpre=None):
        return conv_bn(cpre, bnpre, eps=1e-5)

    def up(pre):
        return {"conv1": dec_conv(f"{pre}._net.0", f"{pre}._net.1"),
                "conv2": dec_conv(f"{pre}._net.3", f"{pre}._net.4")}

    def head1d(pre):
        out = []
        for i in (0, 2, 4, 6):
            w = np.asarray(state[f"{pre}.{i}.weight"], np.float32)
            w = w.transpose(2, 1, 0)[None] if w.ndim == 3 else \
                _t_conv(w[..., None])
            # conv1d [out,in,1] -> [1,1,in,out]
            out.append({"w": j(np.ascontiguousarray(w)),
                        "b": j(np.asarray(state[f"{pre}.{i}.bias"]))})
        return out

    decoder = {
        "conv2": dec_conv("decoder.conv2"),
        "up1": up("decoder.up1"),
        "up2": up("decoder.up2"),
        "up3": up("decoder.up3"),
        "up4": up("decoder.up4"),
        "out_res8": dec_conv("decoder.out_conv_res8"),
        "out_res4": head1d("decoder.out_conv_res4"),
        "out_res2": head1d("decoder.out_conv_res2"),
        "out_res1": head1d("decoder.out_conv_res1"),
    }
    return {"encoder": encoder, "decoder": decoder}, cfg
