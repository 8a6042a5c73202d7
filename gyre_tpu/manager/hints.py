"""HintsetManager: hint-type -> conditioning model resolution (reference
gyre/hints.py:10-43 + hintsets.yaml semantics: named sets mapping hint
types to models with aliases and priorities).

Hint models are ControlNets or T2I-Adapters; with no local weights they
random-init (same compute graph) so the full hint path stays testable and
benchable."""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

# canonical hint types the protocol knows (reference hintsets.yaml)
HINT_ALIASES = {
    "canny": "canny_edge", "canny_edge": "canny_edge", "edge": "canny_edge",
    "hed": "soft_edge", "softedge": "soft_edge", "soft_edge": "soft_edge",
    "depth": "depth", "depth_map": "depth",
    "normal": "normal", "normal_map": "normal",
    "pose": "pose", "openpose": "pose", "keypose": "pose",
    "segmentation": "segmentation", "seg": "segmentation",
    "scribble": "scribble", "mlsd": "mlsd", "shuffle": "shuffle",
    "tile": "tile", "inpaint": "inpaint", "lineart": "lineart",
}


@dataclass
class HintModelSpec:
    hint_type: str
    kind: str = "controlnet"        # controlnet | t2i
    model: str | None = None        # weights path or None (random-init)
    priority: int = 0
    engine_filter: str = ""         # substring match vs engine id ("" = any)


class HintsetManager:
    def __init__(self, specs: list[dict] | None, unet_cfg,
                 compute_dtype=jnp.bfloat16):
        self.unet_cfg = unet_cfg
        self.compute_dtype = compute_dtype
        self.specs: list[HintModelSpec] = []
        for entry in specs or []:
            if not isinstance(entry, dict):
                continue
            for htype, cfg in (entry.get("hints") or {}).items():
                if isinstance(cfg, str):
                    cfg = {"model": cfg}
                self.specs.append(HintModelSpec(
                    hint_type=HINT_ALIASES.get(htype, htype),
                    kind=(cfg or {}).get("kind", "controlnet"),
                    model=(cfg or {}).get("model"),
                    priority=int((cfg or {}).get("priority", 0))))
        self._cache: dict = {}

    def for_type(self, hint_type: str, unet_cfg=None):
        """-> {"params", "kind"} or None. Highest priority spec wins;
        unknown-but-aliasable types fall back to a random-init controlnet
        so the request still runs end-to-end. unet_cfg must be the serving
        engine's config (conditioning models are architecture-bound)."""
        cfg = unet_cfg or self.unet_cfg
        htype = HINT_ALIASES.get(hint_type, hint_type)
        candidates = [s for s in self.specs if s.hint_type == htype]
        candidates.sort(key=lambda s: -s.priority)
        spec = candidates[0] if candidates else HintModelSpec(htype)
        key = (htype, spec.kind, spec.model, cfg)
        if key not in self._cache:
            self._cache[key] = self._build(spec, cfg)
        return self._cache[key]

    def _build(self, spec: HintModelSpec, cfg):
        if spec.kind == "t2i":
            from ..models import t2i_adapter

            channels = tuple(cfg.block_out_channels) + \
                (cfg.block_out_channels[-1],) * \
                (4 - len(cfg.block_out_channels))
            params = t2i_adapter.init(
                jax.random.PRNGKey(hash(spec.hint_type) & 0x7FFFFFFF),
                channels=channels[:4], dtype=self.compute_dtype)
            return {"params": params, "kind": "t2i"}
        from ..models import controlnet

        if spec.model:
            from ..models.load import load_controlnet_params, read_safetensors

            state = read_safetensors(spec.model)
            params = load_controlnet_params(state, cfg, self.compute_dtype)
        else:
            logger.info("hint %s: random-init controlnet (no weights "
                        "configured)", spec.hint_type)
            params = controlnet.init(
                jax.random.PRNGKey(hash(spec.hint_type) & 0x7FFFFFFF),
                cfg, dtype=self.compute_dtype)
        return {"params": params, "kind": "controlnet"}
