"""Pallas fusion switchboard.

GYRE_PALLAS_FUSION = "auto"/"1"/"on"/"0"/"off". Default OFF everywhere:
the on-chip shootout (scripts/profile_fusion.py, v5e via axon) measured
the fused GN+SiLU+conv3x3 kernel at 0.90x-1.03x of the XLA chain — XLA
already fuses the normalize into the conv read well enough that the
handarranged 3-traversal schedule buys nothing. The kernel stays as
measured infrastructure (and the integration is exercised in interpret
mode by tests/test_fused_norm_conv.py) for future libtpu versions.
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
        else:
            # "auto" = off: measured no win vs XLA on v5e (module doc)
            _STATE = False
    return _STATE


def override(value: bool | None):
    """Test hook: force fusion on/off (None = re-evaluate)."""
    global _STATE
    _STATE = value


def gn_conv_fusable(x_shape, w_shape) -> bool:
    from .fused_norm_conv import fusable

    return fusable(x_shape, w_shape)
