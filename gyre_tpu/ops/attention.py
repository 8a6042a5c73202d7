"""Flash attention as a Pallas TPU kernel.

Replaces the reference's xformers memory-efficient attention
(gyre/pipeline/xformers_utils.py) / attention slicing (vram mode): the
online-softmax formulation never materializes the [T, T] logits matrix in
HBM, which is the dominant memory-bandwidth cost of UNet self-attention at
512^2+ (T=4096; SDXL 1024^2 level-1 T=16384).

Design (per pallas_guide):
  * grid = (B*H, T_q / BLOCK_Q); K/V for one (batch, head) live whole in
    VMEM (T=16384, D<=128, bf16 -> 4 MB each, within the 16 MB budget);
    the kernel loops KV in BLOCK_K chunks with a fori_loop carrying
    (m, l, acc) — the standard streaming softmax.
  * head_dim is zero-padded to a multiple of 128 lanes outside the kernel;
    zero K columns don't change logits, zero V columns are sliced off.
  * softmax statistics in f32, matmuls through the MXU with
    preferred_element_type=f32.

Falls back to the jnp reference implementation off-TPU (CPU tests) and for
short sequences where XLA's fused path is already optimal.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# measured on v5e (scripts + ROADMAP "Performance"): T=4096 d=40 flash
# runs 53 ms at 128/128 blocks and 12.6 ms at >=256/512 (small blocks are
# loop-overhead-bound); insensitive beyond that
BLOCK_Q = 512
BLOCK_K = 1024
LANE = 128


def _ref_attention(q, k, v, scale):
    """jnp reference, [B,H,T,D]."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=v.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  block_k, kv_valid, chunks_per_block, kv_rows,
                  num_kv_blocks, l_col, exp_bf16):
    """One (bh, q-block, kv-grid-block) step. For T<=8192 the whole K/V
    for this (batch, head) sits in VMEM as a single kv grid block
    (pallas keeps it resident across q-blocks — DMA'd once per head; the
    round-2 kv-in-the-grid layout re-fetched K/V per q-block and ran 6x
    slower than XLA). Longer sequences split K/V into the third grid
    axis so the double-buffered blocks fit VMEM (whole-KV at SDXL's
    T=16384 is 8.4 MB x2 = scoped-vmem OOM), with the online-softmax
    state carried in scratch across kv grid steps. The kernel streams
    block_k sub-chunks out of the resident block with a fori_loop."""
    import jax.experimental.pallas as pl

    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                       # [BQ, D] bf16
    bq = q.shape[0]
    masked = kv_valid != num_kv_blocks * kv_rows

    def body(ci, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(ci * block_k, block_k), :]  # [CK, D]
        v = v_ref[0, pl.ds(ci * block_k, block_k), :]
        # matmuls in input dtype (bf16 MXU), stats in f32. q arrives
        # pre-multiplied by scale*log2(e) (see flash_attention_bhtd), so
        # s is already in the log2 domain: exp2 is the VPU's native
        # transcendental and the per-element `* scale` multiply on the
        # [BQ, CK] score tile is gone — at SDXL shapes the softmax VPU
        # chain is the kernel's bottleneck (PERFORMANCE.md), so every
        # removed vector op on the score tile counts.
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [BQ, CK]
        if masked:
            col = jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1) + \
                ki * kv_rows + ci * block_k
            s = jnp.where(col < kv_valid, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        if exp_bf16:
            # bf16 transcendental: the arg is in [-inf, 0] and the f32
            # path casts p to bf16 before the MXU anyway, so matmul-input
            # precision is identical — only the (already sub-1%) arg
            # rounding moves
            p = jnp.exp2((s - m_new).astype(v.dtype))
        else:
            p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        if l_col is None:
            l = l * alpha + jnp.sum(p.astype(jnp.float32), axis=-1,
                                    keepdims=True)
        # when l_col is set, V's first zero-padding column holds ones, so
        # this matmul also accumulates the softmax denominator into
        # acc[:, l_col] — the row-sum rides the MXU instead of a VPU
        # reduction pass over the [BQ, CK] tile
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    carry0 = (m_scr[:], l_scr[:], acc_scr[:])
    m, l, acc = jax.lax.fori_loop(0, chunks_per_block, body, carry0)
    m_scr[:] = m
    l_scr[:] = l
    acc_scr[:] = acc

    @pl.when(ki == num_kv_blocks - 1)
    def _():
        acc = acc_scr[:]
        if l_col is None:
            l = l_scr[:]
        else:
            l = acc[:, l_col:l_col + 1]
        o_ref[0] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# Scoped-vmem limit on v5e is 16 MiB; leave headroom for Mosaic
# bookkeeping the estimate below can't see. The estimator was validated
# against a real compile failure: (bq=1024, bk=1024, kv=8192, d=128)
# estimates 17.5 MiB and the compiler reported 17.40 MiB.
_VMEM_BUDGET = 14 * 2**20


def _vmem_estimate(block_q, block_k, kv_rows, d_pad):
    io = 2 * (block_q * d_pad * 2) * 2        # q + out blocks, dbl-buffered
    kv = 2 * (kv_rows * d_pad * 2) * 2        # k + v blocks, dbl-buffered
    scratch = block_q * d_pad * 4 + 2 * block_q * 4
    temps = block_q * block_k * 8             # f32 score tile + exp/cast
    return io + kv + scratch + temps


@functools.partial(jax.jit, static_argnames=(
    "scale", "block_q", "block_k", "kv_budget", "exp_bf16"))
def _flash_forward(q, k, v, scale: float, *, block_q: int = 0,
                   block_k: int = 0, kv_budget: int = 0,
                   exp_bf16: bool = False):
    """[B,H,Tq,D] x [B,H,Tk,D] -> [B,H,Tq,D] via the Pallas kernel.

    q is pre-multiplied by scale*log2(e) so the kernel's streaming
    softmax runs entirely in the log2 domain (exp2 = the hardware
    transcendental, no per-element scale multiply on the score tile).

    block_q/block_k/kv_budget/exp_bf16 override the measured defaults
    (scripts/profile_attn_sdxl.py sweeps them); 0 = auto. Whatever the
    request, block sizes are shrunk until the static VMEM estimate fits
    the 16 MiB scoped-vmem budget — oversized configs are a hard
    compile error on the remote-compile platform, not a slowdown."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, tq, d = q.shape
    tk = k.shape[2]
    q = q * jnp.asarray(scale * math.log2(math.e), q.dtype)
    d_pad = max(LANE, ((d + LANE - 1) // LANE) * LANE)
    # Block choice, measured on v5e at T=16384/d=64 (profile_attn_sdxl):
    # the score-tile width block_k dominates (1024 -> 512 costs 28%:
    # 24.6 -> 31.6 ms), KV grid residency matters least (whole-KV 4 MB
    # vs 2 MB blocks is within 2%), bf16 exp2 is a wash. So shrink KV
    # residency first, score tile last, when fitting scoped VMEM.
    block_q = block_q or (
        2 * BLOCK_Q if tq >= 4096 and d_pad <= LANE else BLOCK_Q)
    # KV chunk: sublane-aligned (16 rows) and no larger than needed
    block_k = min(block_k or BLOCK_K, ((tk + 15) // 16) * 16)
    kv_budget = kv_budget or 4 * 1024 * 1024
    while True:
        max_rows = max(block_k, kv_budget // (d_pad * 2 * 2))
        kv_rows = min(((tk + block_k - 1) // block_k) * block_k,
                      (max_rows // block_k) * block_k)
        if _vmem_estimate(block_q, block_k, kv_rows, d_pad) <= _VMEM_BUDGET:
            break
        if kv_budget // (d_pad * 2 * 2) > block_k and kv_budget > 2**20:
            kv_budget //= 2
        elif block_q > BLOCK_Q:
            block_q //= 2
        elif block_k > 512:
            block_k //= 2
        else:
            break
    tq_pad = ((tq + block_q - 1) // block_q) * block_q
    tk_pad = ((tk + kv_rows - 1) // kv_rows) * kv_rows
    num_kv_blocks = tk_pad // kv_rows

    qp = _pad_to(_pad_to(q, d_pad, 3), tq_pad, 2).reshape(b * h, tq_pad, d_pad)
    kp = _pad_to(_pad_to(k, d_pad, 3), tk_pad, 2).reshape(b * h, tk_pad, d_pad)
    vp = _pad_to(_pad_to(v, d_pad, 3), tk_pad, 2).reshape(b * h, tk_pad, d_pad)
    # softmax denominator on the MXU: when D is lane-padded, the first
    # padding column of V carries ones so p @ v accumulates the row-sum
    # into acc[:, d] for free (padded KV rows are masked to p=0, and when
    # unmasked there are no padded rows)
    l_col = d if d < d_pad else None
    if l_col is not None:
        vp = vp.at[:, :, l_col].set(1.0)
    kernel = functools.partial(
        _flash_kernel, block_k=block_k, kv_valid=tk,
        chunks_per_block=kv_rows // block_k, kv_rows=kv_rows,
        num_kv_blocks=num_kv_blocks, l_col=l_col, exp_bf16=exp_bf16)
    grid = (b * h, tq_pad // block_q, num_kv_blocks)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j, ki: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_rows, d_pad), lambda i, j, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_rows, d_pad), lambda i, j, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad),
                               lambda i, j, ki: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq_pad * tk_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * tq_pad * tk_pad,
        ),
    )(qp, kp, vp)
    out = out.reshape(b, h, tq_pad, d_pad)[:, :, :tq, :d]
    return out


# -------------------------------------------------------------- grad path

GRAD_BLOCK_Q = 512


def chunked_attention_bhtd(q, k, v, scale: float,
                           block_q: int = GRAD_BLOCK_Q):
    """Differentiable memory-bounded attention, [B,H,T,D]: lax.map over
    rematerialized q-blocks, so neither the forward trace nor autodiff
    residuals ever hold the full [Tq, Tk] probability tensor — peak
    extra memory is one [block_q, Tk] f32 tile per (batch, head).

    This is the grad path behind flash_attention_bhtd's custom_vjp: the
    TPU-native equivalent of the reference dropping to a grad-capable
    SlicedAttnProcessor for CLIP guidance when xformers isn't reversible
    (gyre/pipeline/unified_pipeline.py:1452-1517,
    gyre/pipeline/xformers_utils.py:37-60)."""
    b, h, tq, d = q.shape
    block_q = min(block_q, tq)
    tq_pad = ((tq + block_q - 1) // block_q) * block_q
    qp = _pad_to(q, tq_pad, 2)
    qb = jnp.moveaxis(
        qp.reshape(b, h, tq_pad // block_q, block_q, d), 2, 0)

    @jax.checkpoint
    def blk(qi):
        logits = jnp.einsum("bhqd,bhkd->bhqk", qi, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                          preferred_element_type=jnp.float32
                          ).astype(q.dtype)

    out = jnp.moveaxis(jax.lax.map(blk, qb), 0, 2)
    return out.reshape(b, h, tq_pad, d)[:, :, :tq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_diff(q, k, v, scale):
    return _flash_forward(q, k, v, scale)


def _flash_diff_fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _flash_diff_bwd(scale, res, g):
    # Pallas kernels have no autodiff; recompute block-wise through the
    # chunked reference (same f32-softmax math) and take its VJP. CLIP
    # guidance (pipeline/clip_guidance.py) is the only grad consumer —
    # one extra chunked forward per guided step.
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: chunked_attention_bhtd(q_, k_, v_, scale),
        q, k, v)
    return vjp(g.astype(q.dtype))


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def flash_attention_bhtd(q, k, v, scale: float, *, block_q: int = 0,
                         block_k: int = 0, kv_budget: int = 0,
                         exp_bf16: bool = False):
    """Flash attention, [B,H,Tq,D] — differentiable (custom_vjp with a
    rematerialized chunked backward). Tuning overrides (profiling
    scripts) bypass the vjp wrapper and are forward-only."""
    if block_q or block_k or kv_budget or exp_bf16:
        return _flash_forward(q, k, v, scale, block_q=block_q,
                              block_k=block_k, kv_budget=kv_budget,
                              exp_bf16=exp_bf16)
    return _flash_diff(q, k, v, float(scale))


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


# Flash dispatch thresholds, measured on v5e-1 (scripts/probe_dispatch.py,
# round 4). Two regimes:
#   * memory: XLA materializes the full [T,T] logits in HBM and OOMs at
#     SD2-768/SDXL-hires sizes (f32[2,20,9216,9216] = 27 GB); flash is the
#     only path at Tq >= 8192 regardless of head width.
#   * throughput: at d >= 64 (lane padding <= 2x) flash beats XLA's fused
#     attention at EVERY self-attn length >= 1024 — 3.8-4.7x at the
#     SDXL-1024 level-1 shape (T=4096 d=64: 2.9 vs 10.9 ms at CFG b=2,
#     8.4 vs 39.4 ms at b=8), ~15% at T=1024. At d=40 (3.2x padding) XLA
#     keeps a slight edge (12.0 vs 12.7 ms at SD1.5's T=4096 b=16).
# Cross-attention (Tk=77) stays on XLA: the logits tensor is tiny and XLA
# wins or ties at every probed shape (2x at the SD1.5 serving shape).
FLASH_MIN_SEQ = 8192      # memory bound: flash regardless of head width
FLASH_MIN_SEQ_WIDE = 1024  # throughput bound: flash when d >= 64


def attention(q, k, v, mask=None, scale: float | None = None,
              impl: str = "auto"):
    """Multi-head attention, [B,T,H,D] layout (models/layers.py contract).

    impl: "auto" (flash on TPU for long unmasked self-attention),
          "flash", or "ref".
    """
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    tq, tk = q.shape[1], k.shape[1]
    use_flash = (impl == "flash" or
                 (impl == "auto" and mask is None and _on_tpu() and
                  min(tq, tk) >= FLASH_MIN_SEQ_WIDE and
                  (tq >= FLASH_MIN_SEQ or d >= 64)))
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if use_flash:
        out = flash_attention_bhtd(qt, kt, vt, scale)
    else:
        logits = jnp.einsum("bhqd,bhkd->bhqk", qt, kt,
                            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(vt.dtype), vt,
                         preferred_element_type=vt.dtype)
    return jnp.swapaxes(out, 1, 2)
