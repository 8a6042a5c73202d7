"""ZoeDepth metric-bins head over the DPT trunk.

The reference runs the zoedepth package over a MiDaS core
(gyre/pipeline/depth/zoe_model_wrapper.py:1-266, zoe_depth_pipeline.py);
its submodule is empty in-tree, so this is a reimplementation of the
published ZoeDepth architecture (single-head ZoeD_N configuration):

  * SeedBinRegressorUnnormed — softplus seed bin centers from the
    bottleneck (l4_rn) feature;
  * Projector + AttractorLayerUnnormed per decoder level — each level's
    embedding emits attractor points that pull the bin centers
    (inverse-attractor dx/(1+alpha*dx^gamma), mean-reduced);
  * ConditionalLogBinomial — per-pixel log-binomial distribution over
    the bins, conditioned on [out_conv activation | rel_depth], with a
    learned probability/temperature pair;
  * metric depth = sum(p * bin_centers).

All convs are 1x1, so the head is a few fused matmuls on TPU — the DPT
trunk dominates. Checkpoint-loadable from the published zoedepth state
dict key layout (conv2, seed_bin_regressor._net.*, seed_projector._net.*,
projectors.N._net.*, attractors.N._net.*, conditional_log_binomial.mlp.*).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import dpt as dpt_mod

Params = dict


@dataclass(frozen=True)
class ZoeConfig:
    n_bins: int = 64
    bin_embedding_dim: int = 128
    n_attractors: tuple = (16, 8, 4, 1)
    attractor_alpha: float = 1000.0
    attractor_gamma: float = 2.0
    attractor_kind: str = "mean"      # "mean" | "sum"
    attractor_type: str = "inv"       # "inv" | "exp"
    min_temp: float = 0.0212
    max_temp: float = 50.0
    min_depth: float = 1e-3
    max_depth: float = 10.0
    btlnck_features: int = 256
    num_out_features: int = 256       # per-level r4..r1 channels
    mlp_dim: int = 128                # projector/attractor hidden
    seed_mlp_dim: int = 256
    out_conv_ch: int = 32             # trunk head activation channels


ZOE_N = ZoeConfig()
ZOE_TEST = ZoeConfig(n_bins=8, bin_embedding_dim=16,
                     n_attractors=(4, 2, 2, 1), mlp_dim=16, seed_mlp_dim=16,
                     btlnck_features=64, num_out_features=64, out_conv_ch=32)


def _c1x1_init(key, cin, cout, dtype):
    k1, _ = jax.random.split(key)
    scale = 1.0 / np.sqrt(cin)
    return {"w": jax.random.uniform(k1, (1, 1, cin, cout), dtype,
                                    -scale, scale),
            "b": jnp.zeros((cout,), dtype)}


def _mlp2_init(key, cin, mid, cout, dtype):
    k1, k2 = jax.random.split(key)
    return {"c0": _c1x1_init(k1, cin, mid, dtype),
            "c2": _c1x1_init(k2, mid, cout, dtype)}


def init(key, cfg: ZoeConfig = ZOE_TEST, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 16))
    p: Params = {
        "conv2": _c1x1_init(next(ks), cfg.btlnck_features,
                            cfg.btlnck_features, dtype),
        "seed_bin_regressor": _mlp2_init(next(ks), cfg.btlnck_features,
                                         cfg.seed_mlp_dim, cfg.n_bins,
                                         dtype),
        "seed_projector": _mlp2_init(next(ks), cfg.btlnck_features,
                                     cfg.mlp_dim, cfg.bin_embedding_dim,
                                     dtype),
        "projectors": [
            _mlp2_init(next(ks), cfg.num_out_features, cfg.mlp_dim,
                       cfg.bin_embedding_dim, dtype) for _ in range(4)],
        "attractors": [
            _mlp2_init(next(ks), cfg.bin_embedding_dim, cfg.mlp_dim, n,
                       dtype) for n in cfg.n_attractors],
        "clb": _mlp2_init(
            next(ks), cfg.out_conv_ch + 1 + cfg.bin_embedding_dim,
            (cfg.out_conv_ch + 1 + cfg.bin_embedding_dim) // 4, 4, dtype),
    }
    return p


def _conv1x1(p, x):
    y = jnp.einsum("bhwc,cd->bhwd", x, p["w"][0, 0].astype(x.dtype))
    return y + p["b"].astype(x.dtype)


def _mlp2(p, x, act=jax.nn.relu):
    return _conv1x1(p["c2"], act(_conv1x1(p["c0"], x)))


def _resize(x, hw, align=True):
    return dpt_mod.resize_bilinear(x, hw, align_corners=align)


def _attract(centers, attractors, cfg: ZoeConfig):
    """Pull bin centers toward attractor points.
    centers [B,h,w,n_bins], attractors [B,h,w,K]."""
    dx = attractors[..., :, None] - centers[..., None, :]  # [B,h,w,K,n]
    if cfg.attractor_type == "inv":
        pulled = dx / (1.0 + cfg.attractor_alpha *
                       jnp.abs(dx) ** cfg.attractor_gamma)
    else:
        pulled = jnp.exp(-cfg.attractor_alpha *
                         jnp.abs(dx) ** cfg.attractor_gamma) * dx
    red = jnp.mean if cfg.attractor_kind == "mean" else jnp.sum
    return centers + red(pulled, axis=-2)


def _log_binomial(p, t, n_classes: int):
    """LogBinomial distribution over n_classes (zoedepth dist_layers):
    softmax over log C(K-1,k) + k*log(p) + (K-1-k)*log(1-p), temperature
    t. p,t [B,h,w,1] -> probs [B,h,w,K]."""
    eps = 1e-4
    k = jnp.arange(n_classes, dtype=jnp.float32)
    km1 = float(n_classes - 1)
    log_coef = (jax.lax.lgamma(jnp.float32(km1 + 1)) -
                jax.lax.lgamma(k + 1) - jax.lax.lgamma(km1 - k + 1))
    pc = jnp.clip(p, eps, 1.0)
    omp = jnp.clip(1.0 - p, eps, 1.0)
    y = log_coef + k * jnp.log(pc) + (km1 - k) * jnp.log(omp)
    return jax.nn.softmax(y / t, axis=-1)


def apply_head(params: Params, feats: dict, cfg: ZoeConfig = ZOE_TEST
               ) -> jax.Array:
    """DPT feature surface (dpt.apply_features) -> metric depth
    [B,h,w,1] at the out_conv resolution."""
    btlnck = _conv1x1(params["conv2"], feats["l4_rn"].astype(jnp.float32))
    seed = jax.nn.softplus(_mlp2(params["seed_bin_regressor"], btlnck))
    b_prev = seed
    prev_embed = _mlp2(params["seed_projector"], btlnck)
    x_blocks = [feats["r4"], feats["r3"], feats["r2"], feats["r1"]]
    embed = prev_embed
    for proj, attr, xb in zip(params["projectors"], params["attractors"],
                              x_blocks):
        xb = xb.astype(jnp.float32)
        embed = _mlp2(proj, xb)
        prev_up = _resize(prev_embed, xb.shape[1:3])
        a_in = embed + prev_up
        attractors = jax.nn.softplus(_mlp2(attr, a_in))
        b_prev = _resize(b_prev, xb.shape[1:3])
        b_prev = _attract(b_prev, attractors, cfg)
        prev_embed = embed
    b_centers = b_prev

    last = feats["out_conv"].astype(jnp.float32)
    rel = _resize(feats["rel_depth"].astype(jnp.float32), last.shape[1:3])
    cond = _resize(embed, last.shape[1:3])
    clb_in = jnp.concatenate([last, rel, cond], axis=-1)
    pc = jax.nn.softplus(_mlp2(params["clb"], clb_in, act=jax.nn.gelu))
    p2, c2 = pc[..., :2], pc[..., 2:]
    p2 = p2 + 1e-4
    prob = p2[..., :1] / (p2[..., :1] + p2[..., 1:2])
    c2 = c2 + cfg.min_temp
    temp = (c2[..., :1] / (c2[..., :1] + c2[..., 1:2])) * cfg.max_temp
    probs = _log_binomial(prob, temp, cfg.n_bins)
    centers = _resize(b_centers, probs.shape[1:3])
    return jnp.sum(probs * centers, axis=-1, keepdims=True)


def load_zoe_head(state: dict, dtype=None) -> tuple[Params, ZoeConfig]:
    """Published zoedepth checkpoint head keys -> param tree + config
    (shapes dictate n_bins/dims). Accepts 'module.'/'model.' prefixes;
    trunk keys (core.core.*) are ignored here — load them with
    dpt.load_dpt."""
    import dataclasses as dc

    def norm_key(k):
        for pre in ("module.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        return k

    s = {norm_key(k): v for k, v in state.items()}

    def c1x1(pre):
        w = np.asarray(s[f"{pre}.weight"])  # [out,in,1,1]
        p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype)}
        p["b"] = jnp.asarray(np.asarray(s.get(
            f"{pre}.bias", np.zeros(w.shape[0]))), dtype)
        return p

    def mlp2(pre):
        return {"c0": c1x1(f"{pre}.0"), "c2": c1x1(f"{pre}.2")}

    p: Params = {
        "conv2": c1x1("conv2"),
        "seed_bin_regressor": mlp2("seed_bin_regressor._net"),
        "seed_projector": mlp2("seed_projector._net"),
        "projectors": [mlp2(f"projectors.{i}._net") for i in range(4)],
        "attractors": [mlp2(f"attractors.{i}._net") for i in range(4)],
        "clb": mlp2("conditional_log_binomial.mlp"),
    }
    n_bins = int(np.asarray(
        s["seed_bin_regressor._net.2.weight"]).shape[0])
    embed_dim = int(np.asarray(s["seed_projector._net.2.weight"]).shape[0])
    btl = int(np.asarray(s["conv2.weight"]).shape[1])
    out_feats = int(np.asarray(s["projectors.0._net.0.weight"]).shape[1])
    n_attr = tuple(int(np.asarray(
        s[f"attractors.{i}._net.2.weight"]).shape[0]) for i in range(4))
    clb_in = int(np.asarray(
        s["conditional_log_binomial.mlp.0.weight"]).shape[1])
    cfg = dc.replace(
        ZOE_N, n_bins=n_bins, bin_embedding_dim=embed_dim,
        btlnck_features=btl, num_out_features=out_feats,
        n_attractors=n_attr,
        mlp_dim=int(np.asarray(s["projectors.0._net.0.weight"]).shape[0]),
        seed_mlp_dim=int(np.asarray(
            s["seed_bin_regressor._net.0.weight"]).shape[0]),
        out_conv_ch=clb_in - 1 - embed_dim)
    return p, cfg


def estimate_metric_depth(dpt_params: Params, head_params: Params,
                          image: jax.Array,
                          dpt_cfg=None, zoe_cfg: ZoeConfig = ZOE_TEST,
                          size: int = 384) -> jax.Array:
    """Image [B,H,W,3] 0..1 -> metric depth [B,H,W,1] (meters)."""
    dpt_cfg = dpt_cfg or dpt_mod.DPT_LARGE
    B, H, W, _ = image.shape
    x = dpt_mod.resize_bilinear(image.astype(jnp.float32), (size, size))
    x = (x - 0.5) / 0.5
    feats = dpt_mod.apply_features(dpt_params, x, dpt_cfg)
    d = apply_head(head_params, feats, zoe_cfg)
    return dpt_mod.resize_bilinear(d, (H, W))


def estimate_depth_hint(dpt_params: Params, head_params: Params,
                        image: jax.Array, dpt_cfg=None,
                        zoe_cfg: ZoeConfig = ZOE_TEST,
                        size: int = 384) -> jax.Array:
    """Hint-map interface (matches dpt.estimate_depth): inverted metric
    depth, min-max normalized per image (near = bright, the hint
    convention)."""
    d = estimate_metric_depth(dpt_params, head_params, image, dpt_cfg,
                              zoe_cfg, size)
    inv = 1.0 / jnp.maximum(d, zoe_cfg.min_depth)
    lo = inv.min(axis=(1, 2, 3), keepdims=True)
    hi = inv.max(axis=(1, 2, 3), keepdims=True)
    return (inv - lo) / jnp.maximum(hi - lo, 1e-6)
