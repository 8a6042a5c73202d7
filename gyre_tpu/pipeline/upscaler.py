"""UpscalerPipeline: tiled super-resolution with alpha passthrough
(reference gyre/pipeline/upscalers/upscaler_pipeline.py:15-82 + the tile()
helper in upscalers/utils.py).

Tiling keeps the compiled program's shape fixed (one jit for any input
size) and bounds HBM — the TPU analogue of the reference's VRAM-driven
tiling. Tiles overlap and blend with linear feathering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import esrgan


class UpscalerPipeline:
    def __init__(self, params, apply_fn=esrgan.apply, scale: int = 4,
                 tile: int = 128, overlap: int = 16,
                 compute_dtype=jnp.float32):
        self.params = params
        self.apply_fn = apply_fn
        self.scale = scale
        self.tile = tile
        self.overlap = overlap
        self.compute_dtype = compute_dtype
        self._jit = jax.jit(lambda p, x: self.apply_fn(p, x, scale))

    def _feather(self, th: int, tw: int) -> np.ndarray:
        ov = self.overlap * self.scale
        wy = np.ones(th, np.float32)
        wx = np.ones(tw, np.float32)
        ramp = np.linspace(0, 1, ov + 2)[1:-1] if ov else []
        if ov:
            wy[:ov] = ramp
            wy[-ov:] = ramp[::-1]
            wx[:ov] = ramp
            wx[-ov:] = ramp[::-1]
        return wy[:, None, None] * wx[None, :, None]

    def __call__(self, image) -> np.ndarray:
        """image [B,H,W,3|4] float 0..1 -> upscaled [B, sH, sW, C]."""
        img = np.asarray(image, np.float32)
        b, h, w, c = img.shape
        alpha = img[..., 3:] if c == 4 else None
        rgb = img[..., :3]
        s, t, ov = self.scale, self.tile, self.overlap
        step = t - 2 * ov

        # pad to tile grid
        ph = max(0, -(-max(h - 2 * ov, 1) // step) * step + 2 * ov - h)
        pw = max(0, -(-max(w - 2 * ov, 1) // step) * step + 2 * ov - w)
        padded = np.pad(rgb, [(0, 0), (ov, ph + ov), (ov, pw + ov), (0, 0)],
                        mode="reflect")
        H, W = padded.shape[1], padded.shape[2]

        out = np.zeros((b, H * s, W * s, 3), np.float32)
        weight = np.zeros((1, H * s, W * s, 1), np.float32)
        feather = self._feather(t * s, t * s)[None]

        for y in range(0, H - 2 * ov, step):
            y = min(y, H - t)
            for x in range(0, W - 2 * ov, step):
                x = min(x, W - t)
                tile_in = jnp.asarray(padded[:, y:y + t, x:x + t],
                                      self.compute_dtype)
                tile_out = np.asarray(
                    self._jit(self.params, tile_in), np.float32)
                out[:, y * s:(y + t) * s, x * s:(x + t) * s] += \
                    tile_out * feather
                weight[:, y * s:(y + t) * s, x * s:(x + t) * s] += feather

        out = out / np.maximum(weight, 1e-6)
        out = out[:, ov * s:(ov + h) * s, ov * s:(ov + w) * s]
        if alpha is not None:
            from ..ops import images as I

            alpha_up = np.asarray(I.rescale(
                jnp.asarray(alpha), h * s, w * s, fit="strict"))
            out = np.concatenate([out, alpha_up], axis=-1)
        return np.clip(out, 0.0, 1.0)


def build_esrgan_pipeline(weights_path: str | None = None, seed: int = 0,
                          num_blocks: int = 23, tile: int = 128,
                          compute_dtype=jnp.float32,
                          state_dict: dict | None = None) -> UpscalerPipeline:
    if state_dict is not None:
        params = esrgan.load_params(state_dict, compute_dtype)
    elif weights_path:
        from ..models.load import read_safetensors

        params = esrgan.load_params(read_safetensors(weights_path),
                                    compute_dtype)
    else:
        params = esrgan.init(jax.random.PRNGKey(seed),
                             num_blocks=num_blocks, dtype=compute_dtype)
    return UpscalerPipeline(params, scale=4, tile=tile,
                            overlap=min(16, tile // 4),
                            compute_dtype=compute_dtype)
