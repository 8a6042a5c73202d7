"""Tagged latent debugging (reference LatentDebugger,
gyre/pipeline/latent_debugger.py:30-56: per-stage latent->PNG dumps gated
by a configured tag set).

Enable with SD_DEBUG_LATENTS="init,chunk,final" (or "all"). Dumps go
through VisualRecord, so they land in the log ring and are served at
/log/<key> like every other visual record. Latents are previewed with the
linear RGB approximation — cheap enough to leave on in production debug
sessions (no VAE decode on the hot path)."""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("gyre_tpu.latents")


def enabled_tags() -> set[str]:
    raw = os.environ.get("SD_DEBUG_LATENTS", "")
    return {t.strip() for t in raw.split(",") if t.strip()}


def log_latents(tag: str, latents, scaled: bool = True):
    """latents [B,h,w,4] (scaled latent space) -> visual log record,
    when `tag` (or 'all') is enabled."""
    tags = enabled_tags()
    base = tag.split(":")[0]
    if not tags or ("all" not in tags and base not in tags and
                    tag not in tags):
        return
    try:
        import numpy as np

        from ..pipeline.clip_guidance import approx_decode
        from .logview import VisualRecord

        rgb = np.asarray(approx_decode(latents))
        logger.info(VisualRecord(f"latents:{tag}", *list(rgb)))
    except Exception as e:  # noqa: BLE001
        logger.debug("latent dump %s failed: %s", tag, e)
