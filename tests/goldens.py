"""Golden-image harness: stored renders + SSIM comparison (test-only).

VERDICT #7: the reference's test strategy is golden-image runs
(reference tests/happy_path.py, graftedpaint.py, prompt_weights.py write
PNGs under out/ for diffing). This harness stores small golden renders
in tests/fixtures/goldens/ and compares new renders by SSIM, so

  * any numerics regression in the denoise path shows up as an SSIM drop
    against the recorded golden, and
  * the moment real checkpoints are available, reference renders can be
    dropped into the same directory and compared with the same machinery
    (threshold semantics instead of bit-equality — JAX threefry cannot
    reproduce torch Philox bit-streams, see SURVEY §7 "hard parts").

Re-record with GYRE_RECORD_GOLDENS=1 after an *intentional* change.
"""

from __future__ import annotations

import os

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "goldens")


def ssim(a: np.ndarray, b: np.ndarray, window: int = 7) -> float:
    """Mean structural similarity over uniform windows, channels averaged.
    Inputs [H,W,C] float in [0,1]."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    c1, c2 = 0.01 ** 2, 0.03 ** 2

    def box(x):
        """Uniform filter via cumulative sums, valid windows only."""
        c = np.cumsum(np.cumsum(x, axis=0), axis=1)
        c = np.pad(c, [(1, 0), (1, 0)] + [(0, 0)] * (x.ndim - 2))
        w = window
        s = (c[w:, w:] - c[:-w, w:] - c[w:, :-w] + c[:-w, :-w])
        return s / (w * w)

    vals = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch], b[..., ch]
        mx, my = box(x), box(y)
        mxx, myy, mxy = box(x * x), box(y * y), box(x * y)
        vx = mxx - mx * mx
        vy = myy - my * my
        cov = mxy - mx * my
        s = ((2 * mx * my + c1) * (2 * cov + c2) /
             ((mx * mx + my * my + c1) * (vx + vy + c2)))
        vals.append(s.mean())
    return float(np.mean(vals))


def golden_compare(name: str, img: np.ndarray, threshold: float = 0.95):
    """Compare [H,W,C] float image against the stored golden by SSIM.

    Records (and passes) when the golden is absent or GYRE_RECORD_GOLDENS
    is set; otherwise asserts similarity >= threshold.
    """
    img = np.asarray(img, np.float32)
    assert np.isfinite(img).all(), f"{name}: non-finite pixels"
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if os.environ.get("GYRE_RECORD_GOLDENS") or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, img=img.astype(np.float16))
        return
    golden = np.load(path)["img"].astype(np.float32)
    score = ssim(img, golden)
    assert score >= threshold, (
        f"{name}: SSIM {score:.4f} < {threshold} vs stored golden "
        f"({path}); re-record with GYRE_RECORD_GOLDENS=1 if the change "
        f"is intentional")
    return score
