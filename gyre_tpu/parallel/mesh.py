"""Device mesh + sharding rules: the TPU-native replacement for the
reference's per-GPU device queue (gyre/manager.py:640-651, 2081-2139).

Instead of one pipeline bound to one device, an engine's weights live once
on a jax.sharding.Mesh with axes:

  dp — data parallel: request batches shard across it (each chip denoises
       different samples; zero cross-chip traffic in the UNet)
  tp — tensor parallel: transformer q/k/v/out and MLP weights shard across
       attention heads / hidden dim, so a single large request (SDXL 1024²)
       can span chips; XLA inserts the all-reduces over ICI.

Single-chip (v5e-1) degenerates to mesh (1,1) with zero overhead: the
sharding annotations become no-ops.
"""

from __future__ import annotations

import math
import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, tp: int | None = None) -> Mesh:
    """Build a (dp, tp) mesh over the given (default: all) devices.

    tp defaults to 1 — SD-family UNets fit comfortably in one v5e chip's
    HBM, so dp is the default scale-out; pass tp>1 to split attention
    heads for very large models/resolutions.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp = tp or 1
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    arr = np.array(devices).reshape(n // tp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


# --------------------------------------------------------- sharding rules

# path-pattern -> PartitionSpec for UNet/CLIP transformer weights.
# Conv weights stay replicated (conv channels are small relative to ICI
# cost at SD scale); transformer matmuls carry most SDXL FLOPs and shard
# cleanly over heads/hidden.
_TP_RULES = [
    # attention projections: columns (heads) sharded
    (re.compile(r"attn\d?/(q|k|v)/w$"), P(None, "tp")),
    (re.compile(r"attn\d?/(q|k|v)/b$"), P("tp")),
    # output projection: rows sharded (reduce over tp)
    (re.compile(r"attn\d?/out/w$"), P("tp", None)),
    (re.compile(r"attn\d?/out/b$"), P()),
    # MLP: ff1 columns, ff2 rows; CLIP fc1/fc2 likewise
    (re.compile(r"(ff1|fc1)/w$"), P(None, "tp")),
    (re.compile(r"(ff1|fc1)/b$"), P("tp")),
    (re.compile(r"(ff2|fc2)/w$"), P("tp", None)),
    (re.compile(r"(ff2|fc2)/b$"), P()),
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_specs(params, use_tp: bool = True):
    """PartitionSpec tree for a params pytree (UNet, CLIP, or VAE)."""

    def spec_for(path, leaf):
        s = _path_str(path)
        if use_tp:
            for pat, spec in _TP_RULES:
                if pat.search(s):
                    # only shard if the dimension actually divides
                    return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _divisible(leaf, spec: P, tp: int) -> bool:
    for dim, axis in enumerate(spec):
        if axis == "tp" and (dim >= leaf.ndim or leaf.shape[dim] % tp != 0):
            return False
    return True


def param_shardings(params, mesh: Mesh):
    """Tree of NamedShardings for a params (or shape-struct) tree:
    tp-sharded where the tp rules match and the dimension divides,
    replicated otherwise. Works on jax.eval_shape output too (only
    paths and .shape/.ndim are read)."""
    tp = mesh.shape["tp"]
    specs = param_specs(params, use_tp=tp > 1)

    def shard_for(leaf, spec):
        if tp > 1 and not _divisible(leaf, spec, tp):
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree.map(shard_for, params, specs)


def shard_params(params, mesh: Mesh):
    """device_put a params tree with tp sharding where divisible,
    replicated otherwise — as ONE batched device_put (a tree of
    shardings), not per-leaf calls: batching lets the runtime pipeline
    the transfers (the same fix that took engine init 150s -> 53s on
    the tunneled chip)."""
    return jax.device_put(params, param_shardings(params, mesh))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """device_put request tensors batch-sharded over dp (keys, latents,
    contexts all lead with the batch axis)."""
    bs = batch_sharding(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and \
                x.shape[0] % mesh.shape["dp"] == 0:
            return jax.device_put(x, bs)
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(put, tree)


def shard_modelset(ms, mesh: Mesh):
    """Return a copy of a ModelSet with params placed on the mesh."""
    from ..models.modelset import ModelSet

    return ModelSet(
        config=ms.config,
        unet_params=shard_params(ms.unet_params, mesh),
        vae_params=shard_params(ms.vae_params, mesh),
        text_params=[shard_params(t, mesh) for t in ms.text_params],
        tokenizer=ms.tokenizer,
        schedule=ms.schedule,
        id=ms.id,
    )
