"""Pallas fusion switchboard.

GYRE_PALLAS_FUSION = "auto" (default: on for TPU backends, off on CPU
where the XLA chain is faster than interpret mode), "1"/"on", "0"/"off".
Central so models can gate per-op without each re-reading the env.
"""

from __future__ import annotations

import os

_STATE: bool | None = None


def enabled() -> bool:
    global _STATE
    if _STATE is None:
        flag = os.environ.get("GYRE_PALLAS_FUSION", "auto").lower()
        if flag in ("1", "on", "true"):
            _STATE = True
        elif flag in ("0", "off", "false"):
            _STATE = False
        else:
            import jax

            _STATE = jax.default_backend() in ("tpu", "axon")
    return _STATE


def override(value: bool | None):
    """Test hook: force fusion on/off (None = re-evaluate)."""
    global _STATE
    _STATE = value


def gn_conv_fusable(x_shape, w_shape) -> bool:
    from .fused_norm_conv import fusable

    return fusable(x_shape, w_shape)
