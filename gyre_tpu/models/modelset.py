"""ModelSet: one engine's weights + configs + tokenizer bundle.

The functional analogue of the reference's ModelSet frozen dict
(gyre/manager.py:285-370). Weights come from safetensors checkpoints
(load.py handles the torch->JAX key/layout mapping) or random
initialization for weight-less test/bench engines — the compute graph,
shapes and performance are identical either way.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from ..pipeline import schedule as sched
from ..pipeline.tokenizer import FallbackTokenizer, load_tokenizer
from . import clip as clip_mod
from . import configs
from . import unet as unet_mod
from . import vae as vae_mod


@dataclass
class ModelSet:
    config: configs.ModelSetConfig
    unet_params: Any
    vae_params: Any
    text_params: list
    tokenizer: Any
    schedule: sched.DiffusionSchedule
    id: str = "unnamed"

    def param_bytes(self) -> int:
        total = 0
        for tree in [self.unet_params, self.vae_params] + self.text_params:
            total += sum(x.nbytes for x in jax.tree.leaves(tree))
        return total


def _host_random_like(init_fn, key, seed: int, dtype):
    """Build a params tree host-side with numpy, convert to the target
    dtype ON HOST (ml_dtypes), and ship the whole tree with ONE batched
    device_put. The per-leaf jnp.asarray(..., dtype) this replaces cost
    minutes on a tunneled TPU: ~700 synchronous round-trips plus one
    tiny convert_element_type compile per distinct shape, and it moved
    f32 bytes (2x the bf16 payload) over the wire."""
    shapes = jax.eval_shape(init_fn, key)
    rs = np.random.RandomState(seed & 0x7FFFFFFF)
    leaves, treedef = jax.tree.flatten(shapes)
    host_dtype = np.dtype(dtype)  # bf16 is ml_dtypes-backed: host convert
    out = []
    for leaf in leaves:
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        if leaf.ndim == 4:      # conv HWIO: fan-in = kh*kw*cin
            fan = leaf.shape[0] * leaf.shape[1] * leaf.shape[2]
        elif leaf.ndim >= 2:    # linear (in, out) / embeddings
            fan = leaf.shape[-2]
        else:
            fan = 0
        if fan:
            # match torch's kaiming-uniform std: 0.577 / sqrt(fan_in)
            arr = rs.standard_normal(n).astype(np.float32) * \
                (0.577 / max(fan, 1) ** 0.5)
        else:
            # 1-D params: norm scales init to 1, biases to 0 — match by name
            arr = np.zeros(n, np.float32)
        out.append(arr.astype(host_dtype).reshape(leaf.shape))
    return jax.device_put(jax.tree.unflatten(treedef, out))


import numpy as np  # noqa: E402


def _unet_init(key, ucfg, dtype):
    """Dispatch by denoiser config type: standard SD UNet vs the
    sd-x2 latent upscaler's K-UNet (models/kunet.py)."""
    from . import kunet as kunet_mod

    if isinstance(ucfg, kunet_mod.KUNetConfig):
        return kunet_mod.init(key, ucfg, dtype)
    return unet_mod.init(key, ucfg, dtype)


def random_modelset(cfg: configs.ModelSetConfig, seed: int = 0,
                    dtype=jnp.bfloat16, engine_id: str = "random",
                    fast_init: bool = True) -> ModelSet:
    """Architecture-faithful random weights: exercises the full pipeline and
    gives true performance numbers without downloaded checkpoints.

    fast_init=True builds weights host-side (numpy) with matching shapes;
    norm scales init to 1 via a post-pass so activations stay finite."""
    key = jax.random.PRNGKey(seed)
    k_unet, k_vae, *k_tes = jax.random.split(key, 2 + len(cfg.text_encoders))
    schedule = sched.scaled_linear_schedule(
        prediction_type=cfg.prediction_type)

    if fast_init:
        def fix_norms(tree):
            # norm {scale} leaves must be 1.0
            def walk(node):
                if isinstance(node, dict):
                    if set(node) == {"scale", "bias"}:
                        return {"scale": jnp.ones_like(node["scale"]),
                                "bias": node["bias"]}
                    return {k: walk(v) for k, v in node.items()}
                if isinstance(node, list):
                    return [walk(v) for v in node]
                return node

            return walk(tree)

        unet_params = fix_norms(_host_random_like(
            lambda k: _unet_init(k, cfg.unet, dtype), k_unet, seed, dtype))
        vae_params = fix_norms(_host_random_like(
            lambda k: vae_mod.init(k, cfg.vae, dtype), k_vae, seed + 1, dtype))
        text_params = [fix_norms(_host_random_like(
            lambda k, te=te: clip_mod.init(k, te, dtype), k, seed + 2 + i,
            dtype)) for i, (k, te) in enumerate(zip(k_tes, cfg.text_encoders))]
    else:
        unet_params = _unet_init(k_unet, cfg.unet, dtype)
        vae_params = vae_mod.init(k_vae, cfg.vae, dtype)
        text_params = [clip_mod.init(k, te, dtype)
                       for k, te in zip(k_tes, cfg.text_encoders)]

    return ModelSet(
        config=cfg,
        unet_params=unet_params,
        vae_params=vae_params,
        text_params=text_params,
        tokenizer=FallbackTokenizer(),
        schedule=schedule,
        id=engine_id,
    )


def _synth_tree(shapes, dtype, placement):
    """Architecture-faithful pseudo-random params generated ON DEVICE in
    one jitted program, directly into the given shardings — zero host
    generation and zero host->device distribution. Values are a pure
    function of leaf index + element index (multiply-xorshift hash), so
    a mesh-sharded tree and a single-device tree are bit-identical —
    the property dryruns need to assert sharded==single equivalence.
    (Distributing a host-generated SD1.5 tree to 8 virtual CPU devices
    measured >380 s; this generates it in seconds, in parallel.)

    Norm {scale, bias} scales are generated as 1.0 INSIDE the program
    (finite activations, same semantics as random_modelset fast_init):
    an eager ones_like post-pass measured 150s+ of per-leaf dispatch
    overhead on 8 virtual devices."""
    leaves, treedef = jax.tree.flatten(shapes)
    ones = jax.tree.leaves(_norm_scale_mask(shapes))

    def gen():
        out = []
        for i, leaf in enumerate(leaves):
            n = int(np.prod(leaf.shape)) if leaf.shape else 1
            if leaf.ndim == 4:
                fan = leaf.shape[0] * leaf.shape[1] * leaf.shape[2]
            elif leaf.ndim >= 2:
                fan = leaf.shape[-2]
            else:
                fan = 0
            if ones[i]:
                v = jnp.ones((n,), jnp.float32)
            elif fan:
                u = jax.lax.iota(jnp.uint32, n) + jnp.uint32(
                    (i * 2654435761) & 0xFFFFFFFF)
                u = u * jnp.uint32(2654435761)
                u = u ^ (u >> 16)
                u = u * jnp.uint32(2246822519)
                u = u ^ (u >> 13)
                # uniform(-.5,.5) has std 1/sqrt(12); scale to the
                # kaiming-uniform-matching 0.577/sqrt(fan)
                v = (u.astype(jnp.float32) / jnp.float32(2 ** 32) - 0.5) \
                    * jnp.float32(2.0 / fan ** 0.5)
            else:
                v = jnp.zeros((n,), jnp.float32)
            out.append(v.astype(dtype).reshape(leaf.shape))
        return jax.tree.unflatten(treedef, out)

    return jax.jit(gen, out_shardings=placement(shapes))()


def _norm_scale_mask(tree):
    """Same-structure tree of bools: True for norm `scale` leaves
    (siblings exactly {scale, bias}) that must be generated as 1.0."""
    if isinstance(tree, dict):
        if set(tree) == {"scale", "bias"}:
            return {"scale": True, "bias": False}
        return {k: _norm_scale_mask(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_norm_scale_mask(v) for v in tree]
    return False


def synth_modelset(cfg: configs.ModelSetConfig, placement,
                   dtype=jnp.float32, engine_id: str = "synth") -> ModelSet:
    """random_modelset semantics, but generated on device via _synth_tree.

    `placement(shape_tree) -> sharding_tree` decides placement (e.g.
    parallel.mesh.param_shardings over a mesh, or a constant
    SingleDeviceSharding). Two calls with different placements produce
    IDENTICAL values — used by the multichip dryrun to check
    sharded-vs-single equivalence at full SD1.5 scale without minutes
    of host->virtual-device distribution."""
    key = jax.random.PRNGKey(0)
    schedule = sched.scaled_linear_schedule(
        prediction_type=cfg.prediction_type)
    unet_params = _synth_tree(
        jax.eval_shape(lambda k: _unet_init(k, cfg.unet, dtype), key),
        dtype, placement)
    vae_params = _synth_tree(
        jax.eval_shape(lambda k: vae_mod.init(k, cfg.vae, dtype), key),
        dtype, placement)
    text_params = [_synth_tree(
        jax.eval_shape(lambda k, te=te: clip_mod.init(k, te, dtype), key),
        dtype, placement) for te in cfg.text_encoders]
    return ModelSet(
        config=cfg,
        unet_params=unet_params,
        vae_params=vae_params,
        text_params=text_params,
        tokenizer=FallbackTokenizer(),
        schedule=schedule,
        id=engine_id,
    )
