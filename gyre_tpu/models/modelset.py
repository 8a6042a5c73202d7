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


def random_modelset(cfg: configs.ModelSetConfig, seed: int = 0,
                    dtype=jnp.bfloat16, engine_id: str = "random") -> ModelSet:
    """Architecture-faithful random weights: exercises the full pipeline and
    gives true performance numbers without downloaded checkpoints."""
    key = jax.random.PRNGKey(seed)
    k_unet, k_vae, *k_tes = jax.random.split(key, 2 + len(cfg.text_encoders))
    schedule = sched.scaled_linear_schedule(
        prediction_type=cfg.prediction_type)
    return ModelSet(
        config=cfg,
        unet_params=unet_mod.init(k_unet, cfg.unet, dtype),
        vae_params=vae_mod.init(k_vae, cfg.vae, dtype),
        text_params=[clip_mod.init(k, te, dtype)
                     for k, te in zip(k_tes, cfg.text_encoders)],
        tokenizer=FallbackTokenizer(),
        schedule=schedule,
        id=engine_id,
    )
