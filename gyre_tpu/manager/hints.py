"""HintsetManager: hint-type -> conditioning model resolution (reference
gyre/hints.py:10-43 + config/engines/hintsets.yaml semantics: named sets
mapping hint types to models with aliases and priorities).

Hintset entries use the reference format —

    - hintset_id: "hintset-sd15-controlnet11"
      controlnet11/canny:
        aliases: ["controlnet/canny", "canny"]
        priority: 210
        model: "@controlnet11-canny"

— where "@model-id" references a model_id config entry whose weights the
EngineManager resolves (HF repo / local path / civitai). The compact
`hints: {type: model}` form from round 1 still parses. With no resolvable
weights a hint model random-inits (same compute graph) so the full hint
path stays testable and benchable."""

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
    "sketch": "scribble", "color": "color", "style": "style",
}

_T2I_FAMILIES = ("t2i", "coadapter")


def _canon(t: str) -> str:
    return HINT_ALIASES.get(t, t)


@dataclass
class HintModelSpec:
    hint_type: str                   # canonical primary type
    aliases: tuple = ()              # extra accepted types (canonicalized)
    kind: str = "controlnet"         # controlnet | t2i
    model: str | None = None         # "@model-id" ref, path, or None
    priority: int = 0
    hintset: str = ""                # owning hintset_id ("" = global)
    name: str = ""                   # entry key, e.g. "controlnet11/canny"

    def matches(self, htype: str) -> bool:
        return htype == self.hint_type or htype in self.aliases


def parse_hintset_entry(entry: dict) -> list[HintModelSpec]:
    """One hintset config dict -> specs (both formats)."""
    out: list[HintModelSpec] = []
    set_id = str(entry.get("hintset_id", ""))
    # round-1 compact format
    for htype, cfg in (entry.get("hints") or {}).items():
        if isinstance(cfg, str):
            cfg = {"model": cfg}
        out.append(HintModelSpec(
            hint_type=_canon(htype), hintset=set_id, name=htype,
            kind=(cfg or {}).get("kind", "controlnet"),
            model=(cfg or {}).get("model"),
            priority=int((cfg or {}).get("priority", 0))))
    # reference format: "<family>/<type>" keys
    for key, cfg in entry.items():
        if key in ("hintset_id", "hints") or not isinstance(cfg, dict):
            continue
        if "/" not in key:
            continue
        family, _, tname = key.partition("/")
        aliases = cfg.get("aliases") or []
        if isinstance(aliases, str):
            aliases = [aliases]
        kind = cfg.get("kind") or (
            "t2i" if family.startswith(_T2I_FAMILIES) else "controlnet")
        out.append(HintModelSpec(
            hint_type=_canon(tname), hintset=set_id, name=key,
            aliases=tuple(_canon(a) for a in aliases),
            kind=kind, model=cfg.get("model"),
            priority=int(cfg.get("priority", 0))))
    return out


class HintsetManager:
    def __init__(self, specs: list[dict] | None, unet_cfg,
                 compute_dtype=jnp.bfloat16, model_loader=None):
        """model_loader: callable("@ref" | path) -> (state_dict, entry
        dict) raising on failure — supplied by EngineManager so "@model-id"
        references resolve through the config model registry."""
        self.unet_cfg = unet_cfg
        self.compute_dtype = compute_dtype
        self.model_loader = model_loader
        self.specs: list[HintModelSpec] = []
        for entry in specs or []:
            if isinstance(entry, dict):
                self.specs.extend(parse_hintset_entry(entry))
        self._cache: dict = {}

    def set_ids(self) -> list[str]:
        return sorted({s.hintset for s in self.specs if s.hintset})

    def types_for(self, hintset: str | None = None) -> list[str]:
        """Advertised hint types (engines servicer capability report)."""
        specs = [s for s in self.specs
                 if not hintset or s.hintset == hintset]
        out = set()
        for s in specs:
            out.add(s.hint_type)
            out.update(s.aliases)
        return sorted(out)

    def for_type(self, hint_type: str, unet_cfg=None,
                 hintset: str | None = None):
        """-> {"params", "kind"} or None. Specs from the engine's hintset
        (all sets when unset) matching the type compete on priority;
        unknown-but-aliasable types fall back to a random-init controlnet
        so the request still runs end-to-end. unet_cfg must be the serving
        engine's config (conditioning models are architecture-bound)."""
        cfg = unet_cfg or self.unet_cfg
        htype = _canon(hint_type)
        pool = [s for s in self.specs
                if not hintset or s.hintset == hintset]
        candidates = [s for s in pool if s.matches(htype)]
        if not candidates and hintset:  # fall back across all sets
            candidates = [s for s in self.specs if s.matches(htype)]
        candidates.sort(key=lambda s: -s.priority)
        spec = candidates[0] if candidates else HintModelSpec(htype)
        key = (htype, spec.kind, spec.model, cfg)
        if key not in self._cache:
            self._cache[key] = self._build(spec, cfg)
        return self._cache[key]

    def _load_state(self, spec: HintModelSpec):
        if not spec.model:
            return None
        if self.model_loader is not None:
            return self.model_loader(spec.model)[0]
        from ..models.load import read_state_dict

        return read_state_dict(spec.model)

    def _build(self, spec: HintModelSpec, cfg):
        state = None
        if spec.model:
            try:
                state = self._load_state(spec)
            except Exception as e:  # noqa: BLE001
                logger.warning("hint %s: weights %s unavailable (%s); "
                               "random-init", spec.hint_type, spec.model, e)
        if spec.kind == "t2i":
            from ..models import t2i_adapter

            if state is not None:
                params = t2i_adapter.load_params(state,
                                                 dtype=self.compute_dtype)
            else:
                channels = tuple(cfg.block_out_channels) + \
                    (cfg.block_out_channels[-1],) * \
                    (4 - len(cfg.block_out_channels))
                params = t2i_adapter.init(
                    jax.random.PRNGKey(hash(spec.hint_type) & 0x7FFFFFFF),
                    channels=channels[:4], dtype=self.compute_dtype)
            return {"params": params, "kind": "t2i"}
        from ..models import controlnet

        if state is not None:
            from ..models.load import load_controlnet_params

            params = load_controlnet_params(state, cfg, self.compute_dtype)
        else:
            if spec.model is None:
                logger.info("hint %s: random-init controlnet (no weights "
                            "configured)", spec.hint_type)
            params = controlnet.init(
                jax.random.PRNGKey(hash(spec.hint_type) & 0x7FFFFFFF),
                cfg, dtype=self.compute_dtype)
        return {"params": params, "kind": "controlnet"}
