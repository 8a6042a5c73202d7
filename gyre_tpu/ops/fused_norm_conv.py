"""Fused GroupNorm+SiLU -> 3x3 conv as a Pallas TPU kernel.

The resnet chain [GN -> SiLU -> conv3x3] is the VAE decoder's (and a good
part of the UNet's) memory bottleneck: XLA runs it as ~5 HBM traversals
of the activation (stats read, normalize read+write, conv read+write;
measured in scripts/profile_gn.py — the standalone GN is already at the
memory roofline, so the win has to come from FUSING the normalize into
the conv's input read). This kernel does:

  pass 1 (XLA):    per-(batch, channel) sums -> folded affine a,b  (1 read)
  pass 2 (Pallas): read halo tile, y = silu(x*a+b) in VMEM, 3x3 conv
                   as 9 shifted (th*W, C) @ (C, Co) MXU matmuls  (1R + 1W)

3 traversals instead of 5, with the conv running on the MXU from VMEM.

Used by the VAE decoder and UNet resnet blocks (stride-1 3x3 convs with
a preceding GroupNorm+SiLU). Falls back to the plain XLA chain on
non-TPU backends or awkward shapes. Layout NHWC, weights HWIO (the
repo-wide convention, models/layers.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_INTERPRET_CACHE: bool | None = None


def _interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU tests)."""
    global _INTERPRET_CACHE
    if _INTERPRET_CACHE is None:
        _INTERPRET_CACHE = jax.default_backend() not in ("tpu", "axon")
    return _INTERPRET_CACHE


def gn_affine(x, scale, bias, groups: int, eps: float = 1e-6):
    """Folded per-(batch, channel) GN affine: y = x*a + b equals
    GroupNorm(x)*scale + bias. One lane-friendly read of x."""
    b = x.shape[0]
    c = x.shape[-1]
    n_sp = x.size // (b * c)
    xf32 = x.astype(jnp.float32)
    s1 = jnp.sum(xf32, axis=tuple(range(1, x.ndim - 1)))       # [B, C]
    s2 = jnp.sum(jnp.square(xf32), axis=tuple(range(1, x.ndim - 1)))
    g1 = s1.reshape(b, groups, c // groups).sum(-1)
    g2 = s2.reshape(b, groups, c // groups).sum(-1)
    cnt = n_sp * (c // groups)
    mean_g = g1 / cnt
    inv_g = lax.rsqrt(g2 / cnt - mean_g * mean_g + eps)
    mean_c = jnp.repeat(mean_g, c // groups, axis=-1)          # [B, C]
    inv_c = jnp.repeat(inv_g, c // groups, axis=-1)
    a = inv_c * scale.astype(jnp.float32)[None]
    bb = bias.astype(jnp.float32)[None] - mean_c * a
    return a, bb


def _make_kernel(th: int, H: int, W: int, C: int, Co: int, act: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles = H // th
    single = n_tiles == 1

    def kernel(x_hbm, a_ref, b_ref, w_ref, bias_ref, out_ref,
               scratch, sem):
        bi = pl.program_id(0)
        t = pl.program_id(1)
        first = t == 0
        last = t == n_tiles - 1

        def copy(src_row, dst_row, n_rows):
            return pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(src_row, n_rows)],
                scratch.at[pl.ds(dst_row, n_rows)],
                sem,
            )
        # NOTE: a_ref/b_ref are full [B, C] blocks (a (1, C) block would
        # violate the TPU sublane-divisibility rule). The DMA writes
        # full-width rows — sublane-offset DMA destinations crash this
        # libtpu's Mosaic compiler — so the conv's W zero-padding is done
        # in-register with jnp.pad below.

        # halo DMA with static sizes per boundary case
        if single:
            copy(0, 1, th).start()
            copy(0, 1, th).wait()
        else:
            @pl.when(first)
            def _():
                copy(0, 1, th + 1).start()
                copy(0, 1, th + 1).wait()

            @pl.when(last)
            def _():
                copy(t * th - 1, 0, th + 1).start()
                copy(t * th - 1, 0, th + 1).wait()

            @pl.when(jnp.logical_not(first | last))
            def _():
                copy(t * th - 1, 0, th + 2).start()
                copy(t * th - 1, 0, th + 2).wait()

        a = a_ref[bi].astype(jnp.float32)            # [C]
        b = b_ref[bi].astype(jnp.float32)
        y = scratch[:, :, :].astype(jnp.float32) * a + b
        if act == "silu":
            y = y * jax.nn.sigmoid(y)
        yn = y.astype(out_ref.dtype)

        # H halo rows beyond the image (first/last tiles) hold garbage
        # from previous grid steps: zero them
        row_ids = lax.broadcasted_iota(jnp.int32, (th + 2, W, 1), 0)
        dead = (first & (row_ids == 0)) | (last & (row_ids == th + 1))
        yn = jnp.where(dead, jnp.zeros_like(yn), yn)
        # conv zero padding on the W edges, in-register
        yn = jnp.pad(yn, ((0, 0), (1, 1), (0, 0)))

        acc = jnp.zeros((th * W, Co), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = yn[dy:dy + th, dx:dx + W, :].reshape(th * W, C)
                acc = acc + jnp.dot(tap, w_ref[dy, dx],
                                    preferred_element_type=jnp.float32)
        acc = acc + bias_ref[0].astype(jnp.float32)
        out_ref[0] = acc.reshape(th, W, Co).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def gn_silu_conv3x3(x, gn_scale, gn_bias, w, conv_bias,
                    groups: int = 32, eps: float = 1e-6, th: int = 8,
                    act: str = "silu"):
    """silu(group_norm(x)*scale+bias) -> 3x3 stride-1 SAME conv, fused.

    Differentiable: the custom VJP recomputes through the unfused XLA
    chain (rematerialization — CLIP guidance differentiates the UNet,
    and Pallas kernels have no automatic autodiff).
    """
    return _gn_silu_conv3x3_impl(x, gn_scale, gn_bias, w, conv_bias,
                                 groups=groups, eps=eps, th=th, act=act)


def _gn_silu_conv3x3_fwd(x, gn_scale, gn_bias, w, conv_bias,
                         groups, eps, th, act):
    out = _gn_silu_conv3x3_impl(x, gn_scale, gn_bias, w, conv_bias,
                                groups=groups, eps=eps, th=th, act=act)
    return out, (x, gn_scale, gn_bias, w, conv_bias)


def _gn_silu_conv3x3_bwd(groups, eps, th, act, res, g):
    x, gn_scale, gn_bias, w, conv_bias = res
    _, vjp = jax.vjp(
        lambda *a: gn_silu_conv3x3_reference(*a, groups=groups, eps=eps,
                                             act=act),
        x, gn_scale, gn_bias, w, conv_bias)
    return vjp(g)


gn_silu_conv3x3.defvjp(_gn_silu_conv3x3_fwd, _gn_silu_conv3x3_bwd)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "th", "act"))
def _gn_silu_conv3x3_impl(x, gn_scale, gn_bias, w, conv_bias, *,
                          groups: int = 32, eps: float = 1e-6, th: int = 8,
                          act: str = "silu"):
    """silu(group_norm(x)*scale+bias) -> 3x3 stride-1 SAME conv.

    x [B,H,W,C] (bf16/f32), w [3,3,C,Co] HWIO, conv_bias [Co].
    Returns [B,H,W,Co] in x.dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    Co = w.shape[-1]
    a, b = gn_affine(x, gn_scale, gn_bias, groups, eps)

    th = min(th, H)
    while H % th:
        th -= 1
    grid = (B, H // th)

    kernel = _make_kernel(th, H, W, C, Co, act)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),         # x stays in HBM
            pl.BlockSpec((B, C), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, C), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, Co), lambda i, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W, Co),
                               lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, W, C), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(x, a, b, w.astype(x.dtype),
      conv_bias.reshape(1, Co).astype(jnp.float32))
    return out


def gn_silu_conv3x3_reference(x, gn_scale, gn_bias, w, conv_bias, *,
                              groups: int = 32, eps: float = 1e-6,
                              act: str = "silu"):
    """The unfused XLA chain (for testing and the non-TPU fallback)."""
    from ..models import layers as L

    p = {"scale": gn_scale, "bias": gn_bias}
    y = L.group_norm(p, x, groups, eps=eps)
    if act == "silu":
        y = L.silu(y)
    return L.conv2d({"w": w, "b": conv_bias}, y)


def fusable(x_shape, w_shape, *, vmem_budget=10 * 1024 * 1024,
            th: int = 8) -> bool:
    """Whether the fused kernel applies: 3x3 HWIO weights, lane-aligned
    channels, and the working set fits VMEM."""
    if len(w_shape) != 4 or w_shape[0] != 3 or w_shape[1] != 3:
        return False
    B, H, W, C = x_shape
    Co = w_shape[-1]
    if C % 128 or Co % 128 or H < 3 or W % 8:
        return False
    th = min(th, H)
    est = ((th + 2) * (W + 2) * C * 2            # scratch (bf16)
           + th * W * Co * 4                     # acc
           + 9 * C * Co * 2                      # weights
           + (th + 2) * (W + 2) * C * 4)         # f32 temp for affine
    return est <= vmem_budget
