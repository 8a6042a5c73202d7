"""Model mixing: weighted merges over parameter trees (reference
gyre/manager.py:1296-1443: weighted_sum / sigmoid / inv_sigmoid /
difference merges over state dicts, incl. the inpaint-unet conv_in
channel-mismatch special case).

Functional form: params trees merge leaf-by-leaf; unmatched leaves keep
the base model's weights; 9-channel inpaint conv_in mixes only the first
4 input channels (the noise-latent slice) like the reference.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _sigmoid_weight(alpha: float) -> float:
    # reference sigmoid merge: smooth remapping of the mix factor
    return float(1.0 / (1.0 + np.exp(-8.0 * (alpha - 0.5))))


def _inv_sigmoid_weight(alpha: float) -> float:
    alpha = min(max(alpha, 1e-6), 1 - 1e-6)
    return float(0.5 + np.log(alpha / (1.0 - alpha)) / 8.0)


def _mix_leaves(a, b, alpha: float):
    """Mix leaf b into a with weight alpha, handling the inpaint conv_in
    shape mismatch (HWIO in-channel dim)."""
    if a.shape == b.shape:
        return (a.astype(jnp.float32) * (1 - alpha) +
                b.astype(jnp.float32) * alpha).astype(a.dtype)
    if (a.ndim == 4 and b.ndim == 4 and a.shape[:2] == b.shape[:2] and
            a.shape[3] == b.shape[3] and a.shape[2] != b.shape[2]):
        n = min(a.shape[2], b.shape[2])
        mixed = (a[:, :, :n].astype(jnp.float32) * (1 - alpha) +
                 b[:, :, :n].astype(jnp.float32) * alpha).astype(a.dtype)
        if a.shape[2] > n:
            return jnp.concatenate([mixed, a[:, :, n:]], axis=2)
        return mixed
    logger.warning("mix: shape mismatch %s vs %s; keeping base",
                   a.shape, b.shape)
    return a


def mix_trees(base, other, alpha: float, algorithm: str = "weighted_sum"):
    """-> new tree = merge(base, other)."""
    if algorithm == "sigmoid":
        alpha = _sigmoid_weight(alpha)
    elif algorithm == "inv_sigmoid":
        alpha = _inv_sigmoid_weight(alpha)
    elif algorithm not in ("weighted_sum", "difference", "add_difference"):
        raise ValueError(f"unknown mix algorithm {algorithm!r}")

    def walk(a, b):
        if isinstance(a, dict):
            return {k: walk(a[k], b[k]) if isinstance(b, dict) and k in b
                    else a[k] for k in a}
        if isinstance(a, list):
            return [walk(x, y) for x, y in zip(a, b)] if \
                isinstance(b, list) and len(a) == len(b) else a
        return _mix_leaves(a, b, alpha)

    return walk(base, other)


def add_difference(base, a, b, alpha: float = 1.0):
    """base + alpha*(a - b): the reference's difference merge used to
    synthesize inpaint variants of finetunes
    (config/templates/stable-diffusion-v1.yaml:30-70 semantics)."""

    def walk(x, y, z):
        if isinstance(x, dict):
            return {k: walk(x[k], y[k], z[k]) if isinstance(y, dict) and
                    k in y and k in z else x[k] for k in x}
        if isinstance(x, list):
            if isinstance(y, list) and len(x) == len(y) == len(z):
                return [walk(i, j, k) for i, j, k in zip(x, y, z)]
            return x
        if x.shape == y.shape == z.shape:
            out = x.astype(jnp.float32) + alpha * (
                y.astype(jnp.float32) - z.astype(jnp.float32))
            return out.astype(x.dtype)
        if x.ndim == 4 and y.ndim == 4 and x.shape[2] != y.shape[2]:
            n = min(x.shape[2], y.shape[2], z.shape[2])
            mixed = x[:, :, :n].astype(jnp.float32) + alpha * (
                y[:, :, :n].astype(jnp.float32) -
                z[:, :, :n].astype(jnp.float32))
            mixed = mixed.astype(x.dtype)
            if x.shape[2] > n:
                return jnp.concatenate([mixed, x[:, :, n:]], axis=2)
            return mixed
        return x

    return walk(base, a, b)


def mix_modelsets(modelsets_with_weights: list[tuple], algorithm: str,
                  engine_id: str = "mixed"):
    """[(ModelSet, weight)] -> mixed ModelSet. Weights are normalized;
    trees merge pairwise left-to-right (the reference mixes ModelSets with
    unet/text_encoder fuzzy keys — here the whole tree merges)."""
    from ..models.modelset import ModelSet

    assert modelsets_with_weights
    total = sum(w for _, w in modelsets_with_weights)
    base_ms, base_w = modelsets_with_weights[0]
    unet = base_ms.unet_params
    texts = list(base_ms.text_params)
    acc_w = base_w / total
    for ms, w in modelsets_with_weights[1:]:
        frac = (w / total) / max(acc_w + w / total, 1e-8)
        unet = mix_trees(unet, ms.unet_params, frac, algorithm)
        texts = [mix_trees(t, o, frac, algorithm)
                 for t, o in zip(texts, ms.text_params)]
        acc_w += w / total
    return ModelSet(config=base_ms.config, unet_params=unet,
                    vae_params=base_ms.vae_params, text_params=texts,
                    tokenizer=base_ms.tokenizer, schedule=base_ms.schedule,
                    id=engine_id)
