"""The sampler zoo: every DiffusionSampler the protocol exposes, as pure
scan-compatible JAX functions over a shared sigma-space denoiser.

Replaces the reference's three scheduler families — diffusers schedulers,
vendored k-schedulers, and k-diffusion sampling functions (reference
gyre/pipeline/common_scheduler.py, kschedulers/, samplers.py:24-67) — with
one functional design: a sampler is

    sample(denoise, x, sigmas, noise_fn, params,
           start=0, steps=None, carry=None, return_carry=False)

where `denoise(x, sigma_vec) -> x0_pred` is the CFG-wrapped model,
`sigmas` is ALWAYS the full descending request ramp (last entry 0), and
`noise_fn(i, tag)` yields batch-independent per-sample noise keyed by the
GLOBAL step index.

Chunked dispatch (progress callbacks + mid-request cancellation, replacing
the reference's tqdm-driven abort, gyre/pipeline/pipeline_wrapper.py:22-79)
runs a sampler in segments: `start` is the global step offset (a traced
scalar, so every middle segment shares one compiled program), `steps` the
segment length (static scan length), and `carry` the sampler's cross-step
state (multistep history for DPM++ 2M/3M, the LMS derivative ring buffer).
Because every step sees the global ramp and global index, a chunked run is
bit-identical to the single-scan run for EVERY sampler — including the
multistep ones the reference can't interrupt cleanly.

SamplerParams fields (eta / churn / churn_tmin / churn_tmax) may be python
floats OR traced jnp scalars: they only enter arithmetic, never control
flow, so sweeping eta or churn never recompiles the denoise program.

The algorithms are the published ones (Song et al. DDIM; Ho et al. DDPM;
Karras et al. 2022 Algorithm 2 for euler/heun/dpm-2 + churn; Lu et al.
DPM-Solver / DPM-Solver++), implemented from the math.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclass(frozen=True)
class SamplerParams:
    """eta/churn knobs. Fields may be traced scalars (no recompiles)."""

    eta: object = 1.0           # ancestral/DDIM eta
    churn: object = 0.0         # Karras s_churn
    churn_tmin: object = 0.0
    churn_tmax: object = 0.0    # <= 0 means unbounded (inf)
    order: int = 2              # dpm_fast / multistep order
    # dpm++2m variants (reference schedulers/sample_dpmpp_2m.py:1-50):
    warmup_lms: bool = False    # midpoint warmup on the first step (static)
    ddim_cutoff: object = 0.0   # first-order fallback below this sigma
    # true step count of the ramp, as a traced scalar, when `sigmas` is
    # padded to a fixed length for compile-shape sharing (serving pads so
    # 20/30/50-step requests run the SAME chunk program). None = derive
    # from sigmas.shape (unpadded).
    n_total: object = None


# ----------------------------------------------------------------- helpers


def _to_d(x, sigma, x0):
    """ODE derivative dx/dsigma for the probability-flow ODE."""
    return (x - x0) / sigma


def _ancestral_steps(sigma, sigma_next, eta):
    """(sigma_down, sigma_up) for ancestral samplers."""
    su = jnp.minimum(
        sigma_next,
        eta * jnp.sqrt(jnp.maximum(
            sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2) / jnp.maximum(sigma ** 2, 1e-20),
            0.0)))
    sd = jnp.sqrt(jnp.maximum(sigma_next ** 2 - su ** 2, 0.0))
    return sd, su


def _expm1(x):
    return jnp.expm1(x)


def _gamma(sigma, n_steps, p: SamplerParams):
    """Karras churn gamma. n_steps is the FULL ramp's step count, so churn
    strength is independent of chunked-dispatch segment boundaries.
    With a padded sigma ramp the shape-derived count is wrong — use the
    traced true count instead."""
    if p.n_total is not None:
        n_steps = p.n_total
    tmin = jnp.asarray(p.churn_tmin, jnp.float32)
    tmax_raw = jnp.asarray(p.churn_tmax, jnp.float32)
    tmax = jnp.where(tmax_raw > 0, tmax_raw, jnp.inf)
    in_range = (sigma >= tmin) & (sigma <= tmax)
    g = jnp.where(in_range,
                  jnp.minimum(jnp.asarray(p.churn, jnp.float32) / n_steps,
                              math.sqrt(2.0) - 1.0), 0.0)
    return g


def _segment(sigmas, start, steps):
    """(n_total, scan index array) for a sampler segment."""
    n = sigmas.shape[0] - 1
    steps = n if steps is None else steps
    return n, jnp.arange(steps) + start


# Each sampler: body scans the GLOBAL step indices start..start+steps-1.
# sigmas: jnp [n+1], descending, sigmas[-1] == 0.


def sample_euler(denoise, x, sigmas, noise_fn, p: SamplerParams,
                 start=0, steps=None, carry=None, return_carry=False):
    n, idx = _segment(sigmas, start, steps)

    def body(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        gamma = _gamma(sigma, n, p)
        sigma_hat = sigma * (1 + gamma)
        eps = noise_fn(i, "churn")
        x = jnp.where(gamma > 0,
                      x + eps * jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0)),
                      x)
        x0 = denoise(x, sigma_hat)
        d = _to_d(x, sigma_hat, x0)
        x = x + d * (sigma_next - sigma_hat)
        return x, None

    x, _ = lax.scan(body, x, idx)
    return (x, ()) if return_carry else x


def sample_euler_ancestral(denoise, x, sigmas, noise_fn, p: SamplerParams,
                           start=0, steps=None, carry=None,
                           return_carry=False):
    n, idx = _segment(sigmas, start, steps)

    def body(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        x0 = denoise(x, sigma)
        sd, su = _ancestral_steps(sigma, sigma_next, p.eta)
        d = _to_d(x, sigma, x0)
        x = x + d * (sd - sigma)
        x = x + noise_fn(i, "anc") * su
        return x, None

    x, _ = lax.scan(body, x, idx)
    return (x, ()) if return_carry else x


def sample_heun(denoise, x, sigmas, noise_fn, p: SamplerParams,
                start=0, steps=None, carry=None, return_carry=False):
    n, idx = _segment(sigmas, start, steps)

    def body(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        gamma = _gamma(sigma, n, p)
        sigma_hat = sigma * (1 + gamma)
        eps = noise_fn(i, "churn")
        x = jnp.where(gamma > 0,
                      x + eps * jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0)),
                      x)
        x0 = denoise(x, sigma_hat)
        d = _to_d(x, sigma_hat, x0)
        dt = sigma_next - sigma_hat
        x_euler = x + d * dt

        def second_order(_):
            x0_2 = denoise(x_euler, jnp.maximum(sigma_next, 1e-8))
            d2 = _to_d(x_euler, jnp.maximum(sigma_next, 1e-8), x0_2)
            return x + (d + d2) * 0.5 * dt

        x = lax.cond(sigma_next > 0, second_order, lambda _: x_euler, None)
        return x, None

    x, _ = lax.scan(body, x, idx)
    return (x, ()) if return_carry else x


def sample_dpm_2(denoise, x, sigmas, noise_fn, p: SamplerParams,
                 start=0, steps=None, carry=None, return_carry=False):
    """Karras DPM-2: midpoint method in sigma^(1/3) space."""
    n, idx = _segment(sigmas, start, steps)

    def body(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        gamma = _gamma(sigma, n, p)
        sigma_hat = sigma * (1 + gamma)
        eps = noise_fn(i, "churn")
        x = jnp.where(gamma > 0,
                      x + eps * jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0)),
                      x)
        x0 = denoise(x, sigma_hat)
        d = _to_d(x, sigma_hat, x0)

        def midpoint(_):
            sn = jnp.maximum(sigma_next, 1e-8)
            sigma_mid = jnp.exp(0.5 * (jnp.log(sigma_hat) + jnp.log(sn)))
            x_2 = x + d * (sigma_mid - sigma_hat)
            x0_2 = denoise(x_2, sigma_mid)
            d2 = _to_d(x_2, sigma_mid, x0_2)
            return x + d2 * (sigma_next - sigma_hat)

        x = lax.cond(sigma_next > 0, midpoint,
                     lambda _: x + d * (sigma_next - sigma_hat), None)
        return x, None

    x, _ = lax.scan(body, x, idx)
    return (x, ()) if return_carry else x


def sample_dpm_2_ancestral(denoise, x, sigmas, noise_fn, p: SamplerParams,
                           start=0, steps=None, carry=None,
                           return_carry=False):
    n, idx = _segment(sigmas, start, steps)

    def body(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        x0 = denoise(x, sigma)
        sd, su = _ancestral_steps(sigma, sigma_next, p.eta)
        d = _to_d(x, sigma, x0)

        def midpoint(_):
            sdn = jnp.maximum(sd, 1e-8)
            sigma_mid = jnp.exp(0.5 * (jnp.log(sigma) + jnp.log(sdn)))
            x_2 = x + d * (sigma_mid - sigma)
            x0_2 = denoise(x_2, sigma_mid)
            d2 = _to_d(x_2, sigma_mid, x0_2)
            return x + d2 * (sd - sigma)

        x = lax.cond(sd > 0, midpoint, lambda _: x + d * (sd - sigma), None)
        x = x + noise_fn(i, "anc") * su
        return x, None

    x, _ = lax.scan(body, x, idx)
    return (x, ()) if return_carry else x


def _lms_coefficients(sigmas: np.ndarray, order: int = 4) -> np.ndarray:
    """Adams-Bashforth coefficients over the sigma grid, integrated
    numerically host-side (data-independent). Returns [n, order]."""
    sig = np.asarray(sigmas, np.float64)
    n = len(sig) - 1
    coeffs = np.zeros((n, order))
    for i in range(n):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            # integrate the Lagrange basis poly over [sigma_i, sigma_{i+1}]
            ts = np.linspace(sig[i], sig[i + 1], 128)
            prod = np.ones_like(ts)
            for k in range(cur_order):
                if k == j:
                    continue
                prod *= (ts - sig[i - k]) / (sig[i - j] - sig[i - k])
            coeffs[i, j] = np.trapezoid(prod, ts)
    return coeffs


def _lms_coefficients_traced(sigmas, order: int = 4,
                             quad: int = 128) -> jnp.ndarray:
    """Adams-Bashforth coefficients as traceable jnp ops, fully
    vectorized over the ramp (no python loop over rows — a padded
    152-length ramp traces in O(1) ops, so k_lms shares the fixed-ramp
    chunk program like every other sampler). Rows past the true ramp
    end get garbage/NaN coefficients but are never indexed: the scan's
    global step indices stay < n_total."""
    sig = sigmas.astype(jnp.float32)
    n = sig.shape[0] - 1
    i = jnp.arange(n)                                   # [n]
    cur = jnp.minimum(i + 1, order)                     # [n]
    # quadrature grid over [sigma_i, sigma_{i+1}]: [n, Q]
    u = jnp.linspace(0.0, 1.0, quad)
    ts = sig[:n, None] + (sig[1:n + 1] - sig[:n])[:, None] * u[None, :]
    # Lagrange nodes sigma_{i-k}, k = 0..order-1: [n, K]
    k = jnp.arange(order)
    node_idx = jnp.maximum(i[:, None] - k[None, :], 0)
    nodes = sig[node_idx]                               # [n, K]
    # factors[n, j, k, Q] = (ts - node_k) / (node_j - node_k), masked to
    # 1 where k == j or k >= cur (inactive node)
    active = (k[None, :] < cur[:, None])                # [n, K]
    denom = nodes[:, :, None] - nodes[:, None, :]       # [n, j, k]
    offdiag = ~jnp.eye(order, dtype=bool)[None]
    use = active[:, None, :] & offdiag                  # [n, j, k]
    denom = jnp.where(use, denom, 1.0)
    fac = (ts[:, None, None, :] - nodes[:, None, :, None]) / \
        denom[..., None]                                # [n, j, k, Q]
    fac = jnp.where(use[..., None], fac, 1.0)
    prod = jnp.prod(fac, axis=2)                        # [n, j, Q]
    coeffs = jnp.trapezoid(prod, ts[:, None, :], axis=-1)  # [n, j]
    coeffs = jnp.where(active, coeffs, 0.0)             # zero j >= cur
    return coeffs.astype(sigmas.dtype)


def sample_lms(denoise, x, sigmas, noise_fn, p: SamplerParams,
               start=0, steps=None, carry=None, return_carry=False, *,
               order: int = 4, coeffs: jnp.ndarray | None = None):
    n, idx = _segment(sigmas, start, steps)
    if coeffs is None:
        if isinstance(sigmas, jax.core.Tracer):
            coeffs = _lms_coefficients_traced(sigmas, order).astype(x.dtype)
        else:
            coeffs = jnp.asarray(
                _lms_coefficients(np.asarray(sigmas), order), x.dtype)

    def body(state, i):
        x, ds = state  # ds: [order, ...] ring buffer of derivatives
        sigma = sigmas[i]
        x0 = denoise(x, sigma)
        d = _to_d(x, sigma, x0)
        ds = jnp.roll(ds, 1, axis=0).at[0].set(d)
        inc = jnp.tensordot(coeffs[i], ds, axes=1)
        return (x + inc, ds), None

    ds0 = carry[0] if carry is not None else \
        jnp.zeros((order,) + x.shape, x.dtype)
    (x, ds), _ = lax.scan(body, (x, ds0), idx)
    return (x, (ds,)) if return_carry else x


def sample_plms(denoise, x, sigmas, noise_fn, p: SamplerParams,
                start=0, steps=None, carry=None, return_carry=False, *,
                order: int = 4, first: bool | None = None):
    """PLMS (PNDM with skip_prk_steps) in sigma space — what the
    reference actually serves for SAMPLER_DDPM (its DIFFUSERS_SAMPLERS
    maps the enum to PNDMScheduler(skip_prk_steps=True), reference
    gyre/pipeline/samplers.py:25-27).

    The diffusers x_t-space update with an Adams-Bashforth combination
    eps_eff of past eps predictions reduces in sigma space to
    x' = x - (sigma_i - sigma_{i+1}) * eps_eff (substitute
    x0 = x - sigma*eps into x' = x0 + sigma'*eps). Order ramps 1/2/3/4
    with available history ([1], [3,-1]/2, [23,-16,5]/12,
    [55,-59,37,-9]/24).

    The first step is diffusers' duplicate-timestep corrector (its plms
    timestep list repeats the second timestep): Euler predictor to
    sigma_1, second eps evaluation there, trapezoid re-step from the
    ORIGINAL x, with only the predictor's eps entering the AB history.
    `first` marks the segment that contains global step 0 — it is a
    STATIC flag (the corrector's two extra denoise calls are traced
    eagerly, outside the scan, only into the first chunk's program);
    when None it is inferred from `start` if that is a host int. The
    next scan step then runs order-2 against the corrector's history,
    exactly diffusers' counter==2 state."""
    if first is None:
        first = isinstance(start, int) and start == 0
    n, idx = _segment(sigmas, start, steps)

    def body(state, i):
        x, ets = state  # ets: [order, ...] newest-first eps history
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        x0 = denoise(x, sigma)
        e = _to_d(x, sigma, x0)  # = (x - x0) / sigma = eps
        ets = jnp.roll(ets, 1, axis=0).at[0].set(e)
        combos = jnp.asarray(
            [[1.0, 0.0, 0.0, 0.0],
             [3 / 2, -1 / 2, 0.0, 0.0],
             [23 / 12, -16 / 12, 5 / 12, 0.0],
             [55 / 24, -59 / 24, 37 / 24, -9 / 24]], x.dtype)
        k = jnp.minimum(i, order - 1)
        eps_eff = jnp.tensordot(combos[k], ets, axes=1)
        x = x - (sigma - sigma_next) * eps_eff
        return (x, ets), None

    if first and idx.shape[0] > 0:
        s0, s1 = sigmas[0], sigmas[1]
        e0 = _to_d(x, s0, denoise(x, s0))
        x_pred = x - (s0 - s1) * e0                    # Euler predictor
        e1 = _to_d(x_pred, s1, denoise(x_pred, s1))
        x = x - (s0 - s1) * 0.5 * (e0 + e1)            # trapezoid corrector
        ets0 = jnp.zeros((order,) + x.shape, x.dtype).at[0].set(e0)
        idx = idx[1:]
    else:
        ets0 = carry[0] if carry is not None and len(tuple(carry)) == 1 \
            else jnp.zeros((order,) + x.shape, x.dtype)
    (x, ets), _ = lax.scan(body, (x, ets0), idx)
    return (x, (ets,)) if return_carry else x


def sample_dpmpp_2s_ancestral(denoise, x, sigmas, noise_fn, p: SamplerParams,
                              start=0, steps=None, carry=None,
                              return_carry=False):
    """DPM-Solver++(2S) with ancestral noise."""
    n, idx = _segment(sigmas, start, steps)
    t_fn = lambda s: -jnp.log(jnp.maximum(s, 1e-10))
    s_fn = lambda t: jnp.exp(-t)

    def body(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        x0 = denoise(x, sigma)
        sd, su = _ancestral_steps(sigma, sigma_next, p.eta)

        def solver(_):
            t, t_next = t_fn(sigma), t_fn(sd)
            h = t_next - t
            s_mid = t + h * 0.5
            x_2 = (s_fn(s_mid) / s_fn(t)) * x - _expm1(-h * 0.5) * x0
            x0_2 = denoise(x_2, s_fn(s_mid))
            return (s_fn(t_next) / s_fn(t)) * x - _expm1(-h) * x0_2

        x = lax.cond(sd > 0, solver, lambda _: x0, None)
        x = x + noise_fn(i, "anc") * su
        return x, None

    x, _ = lax.scan(body, x, idx)
    return (x, ()) if return_carry else x


def sample_dpmpp_2m(denoise, x, sigmas, noise_fn, p: SamplerParams,
                    start=0, steps=None, carry=None, return_carry=False):
    """DPM-Solver++(2M): second-order multistep, the TPU workhorse sampler
    (one model call per step). Cross-step state (the previous denoised
    x0) is an explicit carry, so chunked dispatch — the default serving
    path's progress/cancel mechanism — is bit-identical to one scan."""
    n, idx = _segment(sigmas, start, steps)
    t_fn = lambda s: -jnp.log(jnp.maximum(s, 1e-10))

    def body(state, i):
        x, x0_prev = state
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        x0 = denoise(x, sigma)
        t, t_next = t_fn(sigma), t_fn(sigma_next)
        h = t_next - t
        sn_over_s = jnp.where(sigma_next > 0, sigma_next / sigma, 0.0)

        def first(_):
            if p.warmup_lms:
                # LMS warmup (reference sample_dpmpp_2m warmup_lms):
                # midpoint model evaluation replaces the euler first step
                def warm(_):
                    r = 0.5
                    s_mid = t + r * h
                    sig_mid = jnp.exp(-s_mid)
                    x_2 = (sig_mid / sigma) * x - _expm1(-h * r) * x0
                    return denoise(x_2, sig_mid)

                x0_w = lax.cond(i == 0, warm, lambda _: x0, None)
                return sn_over_s * x - _expm1(-h) * x0_w
            return sn_over_s * x - _expm1(-h) * x0

        def multi(_):
            t_prev = t_fn(sigmas[jnp.maximum(i - 1, 0)])
            h_last = t - t_prev
            r = h_last / h
            x0_d = (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * x0_prev
            return sn_over_s * x - _expm1(-h) * x0_d

        # ddim_cutoff: below this sigma the update falls back to first
        # order (reference sample_dpmpp_2m ddim_cutoff)
        use_multi = (i > 0) & (sigma_next > 0) & \
            (sigma_next > p.ddim_cutoff)
        x_next = jnp.where(sigma_next > 0,
                           lax.cond(use_multi, multi, first, None),
                           x0)
        return (x_next, x0), None

    x0_prev = carry[0] if carry is not None else jnp.zeros_like(x)
    (x, x0_prev), _ = lax.scan(body, (x, x0_prev), idx)
    return (x, (x0_prev,)) if return_carry else x


def sample_dpmpp_sde(denoise, x, sigmas, noise_fn, p: SamplerParams,
                     start=0, steps=None, carry=None, return_carry=False):
    """DPM-Solver++ (stochastic), r=1/2 two-stage."""
    n, idx = _segment(sigmas, start, steps)
    t_fn = lambda s: -jnp.log(jnp.maximum(s, 1e-10))
    s_fn = lambda t: jnp.exp(-t)
    r = 0.5

    def body(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        x0 = denoise(x, sigma)

        def solver(_):
            t, t_next = t_fn(sigma), t_fn(sigma_next)
            h = t_next - t
            s = t + h * r
            fac = 1.0 / (2.0 * r)
            # stage 1
            sd1, su1 = _ancestral_steps(s_fn(t), s_fn(s), p.eta)
            s_1 = t_fn(sd1)
            x_2 = (s_fn(s_1) / s_fn(t)) * x - _expm1(t - s_1) * x0
            x_2 = x_2 + noise_fn(i, "sde1") * su1
            x0_2 = denoise(x_2, s_fn(s))
            # stage 2
            sd2, su2 = _ancestral_steps(s_fn(t), s_fn(t_next), p.eta)
            t_2 = t_fn(sd2)
            x0_d = (1 - fac) * x0 + fac * x0_2
            x_n = (s_fn(t_2) / s_fn(t)) * x - _expm1(t - t_2) * x0_d
            return x_n + noise_fn(i, "sde2") * su2

        x = lax.cond(sigma_next > 0, solver, lambda _: x0, None)
        return x, None

    x, _ = lax.scan(body, x, idx)
    return (x, ()) if return_carry else x


def sample_dpmpp_3m(denoise, x, sigmas, noise_fn, p: SamplerParams,
                    start=0, steps=None, carry=None, return_carry=False):
    """DPM-Solver++ third-order multistep (proto DPMSOLVERPP_3ORDER)."""
    n, idx = _segment(sigmas, start, steps)
    t_fn = lambda s: -jnp.log(jnp.maximum(s, 1e-10))

    def body(state, i):
        x, x0_1, x0_2, h_1, h_2 = state  # previous denoised + step sizes
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        x0 = denoise(x, sigma)
        t, t_next = t_fn(sigma), t_fn(sigma_next)
        h = t_next - t

        def step(_):
            ratio = jnp.where(sigma_next > 0, sigma_next / sigma, 0.0)
            base = ratio * x - _expm1(-h) * x0
            r1 = h_1 / h
            r2 = h_2 / h
            d1_0 = (x0 - x0_1) / r1
            d1_1 = (x0_1 - x0_2) / r2
            d1 = d1_0 + (d1_0 - d1_1) * (r1 / (r1 + r2))
            d2 = (d1_0 - d1_1) / (r1 + r2)
            phi2 = _expm1(-h) / h + 1.0
            phi3 = phi2 / h - 0.5
            ord3 = base + phi2 * d1 - phi3 * d2
            ord2 = base + phi2 * d1_0
            return jnp.where(i >= 2, ord3, jnp.where(i >= 1, ord2, base))

        x_next = jnp.where(sigma_next > 0, step(None), x0)
        return (x_next, x0, x0_1, h, h_1), None

    if carry is not None:
        x0_1, x0_2, h_1, h_2 = carry
    else:
        x0_1, x0_2 = jnp.zeros_like(x), jnp.zeros_like(x)
        h_1, h_2 = jnp.asarray(1.0), jnp.asarray(1.0)
    (x, x0_1, x0_2, h_1, h_2), _ = lax.scan(
        body, (x, x0_1, x0_2, h_1, h_2), idx)
    return (x, (x0_1, x0_2, h_1, h_2)) if return_carry else x


def sample_ddim(denoise, x, sigmas, noise_fn, p: SamplerParams,
                start=0, steps=None, carry=None, return_carry=False):
    """DDIM expressed in sigma space.

    With x_t = x_sigma / sqrt(1+sigma^2), the DDIM update
    x' = sqrt(ac') x0 + sqrt(1-ac'-v^2) eps + v noise maps exactly to
    x = x0 + sigma_down * eps + sigma_up * noise with the ancestral
    (sigma_down, sigma_up) split — i.e. DDIM(eta) is euler-ancestral(eta)
    on the continuous schedule; eta=0 (the default) is the deterministic
    probability-flow step."""
    n, idx = _segment(sigmas, start, steps)

    def body(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        x0 = denoise(x, sigma)
        eps = (x - x0) / sigma
        sd, su = _ancestral_steps(sigma, sigma_next, p.eta)
        x = x0 + sd * eps + noise_fn(i, "ddim") * su
        return x, None

    x, _ = lax.scan(body, x, idx)
    return (x, ()) if return_carry else x


def sample_ddpm(denoise, x, sigmas, noise_fn, p: SamplerParams,
                start=0, steps=None, carry=None, return_carry=False):
    """DDPM ancestral sampling = euler-ancestral with eta=1 discretized on
    the training grid; expressed in sigma space."""
    return sample_euler_ancestral(
        denoise, x, sigmas, noise_fn,
        SamplerParams(eta=1.0, churn=p.churn, churn_tmin=p.churn_tmin,
                      churn_tmax=p.churn_tmax),
        start=start, steps=steps, carry=carry, return_carry=return_carry)


def sample_dpm_fast(denoise, x, sigmas, noise_fn, p: SamplerParams,
                    start=0, steps=None, carry=None, return_carry=False):
    """k-diffusion ``sample_dpm_fast``: singlestep DPM-Solver over a
    uniform grid in t = -log(sigma), split into m = floor(n/3)+1
    segments solved at order 3 except the tail ([3]*(m-2)+[2,1] when
    n%3==0, else [3]*(m-1)+[n%3]) — the reference maps the DPM_FAST
    enum to exactly this solver (gyre/pipeline/samplers.py:54, invoked
    with n=steps and the schedule's sigma_min/sigma_max,
    gyre/pipeline/common_scheduler.py:489-495).

    Scan design: one model call per scan step so chunk-granular
    dispatch keeps working — the segment index, sub-step and order are
    derived arithmetically from the global call index, and the
    segment-start latent + cached eps ride the carry (x_seg, eps0,
    eps_r1). Like k-diffusion, the result is x at sigma_min (no final
    denoise-to-x0). p.eta applies k-diffusion's ancestral variant."""
    n, idx = _segment(sigmas, start, steps)
    nfe = jnp.asarray(p.n_total if p.n_total is not None else n,
                      jnp.int32)
    sigma_max = sigmas[0]
    sigma_min = jnp.maximum(sigmas[nfe - 1], 1e-5)
    t_start = -jnp.log(sigma_max)
    t_end = -jnp.log(sigma_min)
    m = nfe // 3 + 1
    r = nfe % 3
    n3 = jnp.where(r == 0, m - 2, m - 1)   # number of order-3 segments

    def t_of(k):
        return t_start + (t_end - t_start) * k.astype(jnp.float32) \
            / m.astype(jnp.float32)

    if carry is None:
        carry = (x, jnp.zeros_like(x), jnp.zeros_like(x))

    def body(state, i):
        x, x_seg, eps0, eps_r1 = state
        in3 = i < 3 * n3
        tail = i - 3 * n3
        seg = jnp.where(in3, i // 3,
                        jnp.where(r > 0, n3,
                                  jnp.where(tail < 2, n3, n3 + 1)))
        sub = jnp.where(in3, i % 3,
                        jnp.where(r > 0, tail,
                                  jnp.where(tail < 2, tail, 0)))
        order = jnp.where(in3, 3,
                          jnp.where(r > 0, r,
                                    jnp.where(tail < 2, 2, 1)))
        t, t_next = t_of(seg), t_of(seg + 1)
        # ancestral shrink (k-diffusion dpm_solver_fast eta branch)
        sd, su = _ancestral_steps(jnp.exp(-t), jnp.exp(-t_next), p.eta)
        t_next_ = jnp.minimum(t_end, -jnp.log(jnp.maximum(sd, 1e-10)))
        su = jnp.sqrt(jnp.maximum(
            jnp.exp(-2.0 * t_next) - jnp.exp(-2.0 * t_next_), 0.0))
        h = t_next_ - t
        r1 = jnp.where(order == 3, 1.0 / 3.0, 0.5)
        r2 = 2.0 / 3.0
        s1 = t + r1 * h
        s2 = t + r2 * h
        # the single model call of this scan step, at this sub-step's
        # sigma point (x_seg at t / u1 at s1 / u2 at s2)
        sigma_pt = jnp.exp(-jnp.where(sub == 0, t,
                                      jnp.where(sub == 1, s1, s2)))
        x0 = denoise(x, sigma_pt)
        eps = (x - x0) / sigma_pt
        # sub==0 bookkeeping: this x is the segment start
        x_seg_n = jnp.where(sub == 0, x, x_seg)
        eps0_n = jnp.where(sub == 0, eps, eps0)
        eps_r1_n = jnp.where(sub == 1, eps, eps_r1)
        st_n = jnp.exp(-t_next_)
        # candidate updates (k-diffusion dpm_solver_{1,2,3}_step)
        final1 = x_seg_n - st_n * _expm1(h) * eps0_n
        u1 = x_seg_n - jnp.exp(-s1) * _expm1(r1 * h) * eps0_n
        final2 = final1 - st_n / (2.0 * r1) * _expm1(h) \
            * (eps_r1_n - eps0_n)
        u2 = x_seg_n - jnp.exp(-s2) * _expm1(r2 * h) * eps0_n \
            - jnp.exp(-s2) * (r2 / r1) * (_expm1(r2 * h) / (r2 * h)
                                          - 1.0) * (eps_r1_n - eps0_n)
        final3 = final1 - st_n / r2 * (_expm1(h) / h - 1.0) \
            * (eps - eps0_n)
        x_new = jnp.where(
            sub == 0,
            jnp.where(order == 1, final1, u1),
            jnp.where(sub == 1,
                      jnp.where(order == 2, final2, u2),
                      final3))
        # ancestral noise once per segment, on its completing call
        done = sub == order - 1
        x_new = jnp.where(done & (su > 0),
                          x_new + noise_fn(i, "anc") * su, x_new)
        return (x_new, x_seg_n, eps0_n, eps_r1_n), None

    (x, x_seg, eps0, eps_r1), _ = lax.scan(
        body, (x, carry[0], carry[1], carry[2]), idx)
    return (x, (x_seg, eps0, eps_r1)) if return_carry else x


ADAPTIVE_MAX_STEPS = 128


def sample_dpm_adaptive(denoise, x, sigmas, noise_fn, p: SamplerParams,
                        start=0, steps=None, carry=None, return_carry=False,
                        *, rtol: float = 0.05, atol: float = 0.0078,
                        max_steps: int = ADAPTIVE_MAX_STEPS):
    """Adaptive DPM-Solver-12 with PI step-size control, as lax.while_loop
    (the reference's data-dependent python loop becomes compiled control
    flow). Runs between sigmas[0] and the ramp's sigma_min.

    Chunked dispatch: with a carry, `steps` bounds the iterations of THIS
    segment and the solver state (t, h, step, finished) rides the carry —
    the host loop keeps dispatching bounded segments until the carried
    `finished` flag reads 1. The final denoise-to-x0 applies exactly once,
    on the segment where the loop terminates (lax.cond-gated so later
    no-op segments don't corrupt x). One-shot calls (carry=None) ignore
    `steps` and run to completion, exactly as before. NOTE: the PI error
    estimate is a mean over the whole tensor including batch — adaptive
    requests therefore never coalesce (scheduler solo)."""
    sigma_max = sigmas[0]
    sigma_min = jnp.maximum(
        sigmas[-2] if p.n_total is None else sigmas[p.n_total - 1], 1e-3)
    t_start = -jnp.log(sigma_max)
    t_end = -jnp.log(sigma_min)
    h0 = (t_end - t_start) / 16.0

    chunked = carry is not None and len(tuple(carry)) == 5
    if chunked:
        has_state, t_c, h_c, step_c, finished_c = carry
        t0v = jnp.where(has_state > 0, t_c, t_start)
        h0v = jnp.where(has_state > 0, h_c, h0)
        step0 = jnp.where(has_state > 0, step_c, 0)
        finished0 = jnp.where(has_state > 0, finished_c, 0)
        seg_cap = int(steps or max_steps)
    else:
        t0v, h0v = t_start, h0
        step0 = jnp.asarray(0, jnp.int32)
        finished0 = jnp.asarray(0, jnp.int32)
        seg_cap = max_steps

    def cond(c):
        x, t, h, step, it = c
        return (t < t_end) & (step < max_steps) & (it < seg_cap)

    def body(c):
        x, t, h, step, it = c
        h = jnp.minimum(h, t_end - t)
        s0 = jnp.exp(-t)
        s1 = jnp.exp(-(t + h))
        x0 = denoise(x, s0)
        # order-1 (DPM-Solver-1) proposal
        x_1 = (s1 / s0) * x - _expm1(-h) * x0
        # order-2 midpoint proposal
        s_mid = jnp.exp(-(t + h / 2))
        u = (s_mid / s0) * x - _expm1(-h / 2) * x0
        x0_mid = denoise(u, s_mid)
        x_2 = (s1 / s0) * x - _expm1(-h) * x0_mid
        # error estimate between orders
        tol = atol + rtol * jnp.maximum(jnp.abs(x_1), jnp.abs(x_2))
        err = jnp.sqrt(jnp.mean(((x_2 - x_1) / tol) ** 2))
        accept = err <= 1.0
        x = jnp.where(accept, x_2, x)
        t = jnp.where(accept, t + h, t)
        h = h * jnp.clip(0.9 * err ** -0.5, 0.2, 5.0)
        return (x, t, h, step + 1, it + 1)

    x, t, h, step, _ = lax.while_loop(
        cond, body, (x, t0v, h0v,
                     jnp.asarray(step0, jnp.int32),
                     jnp.asarray(0, jnp.int32)))
    done_now = ((t >= t_end) | (step >= max_steps)).astype(jnp.int32)
    if not chunked:
        # final denoise to x0 at sigma_min
        x = denoise(x, jnp.exp(-t_end))
        return (x, ()) if return_carry else x
    # transition-gated final denoise: apply exactly once, when this
    # segment finishes the integration (finished0==0 and done_now==1)
    x = lax.cond((finished0 == 0) & (done_now == 1),
                 lambda xx: denoise(xx, jnp.exp(-t_end)),
                 lambda xx: xx, x)
    finished = jnp.maximum(finished0, done_now)
    new_carry = (jnp.asarray(1, jnp.int32), t, h,
                 jnp.asarray(step, jnp.int32), finished)
    return (x, new_carry) if return_carry else x


# ------------------------------------------------------------------ registry

SAMPLERS = {
    "ddim": sample_ddim,
    "ddpm": sample_ddpm,
    "plms": sample_plms,
    "k_euler": sample_euler,
    "k_euler_ancestral": sample_euler_ancestral,
    "k_heun": sample_heun,
    "k_dpm_2": sample_dpm_2,
    "k_dpm_2_ancestral": sample_dpm_2_ancestral,
    "k_lms": sample_lms,
    "k_dpmpp_2s_ancestral": sample_dpmpp_2s_ancestral,
    "k_dpmpp_2m": sample_dpmpp_2m,
    "k_dpmpp_sde": sample_dpmpp_sde,
    "dpmsolverpp_1order": sample_euler,  # 1st-order dpm++ == ODE euler in lambda; see note
    "dpmsolverpp_2order": sample_dpmpp_2m,
    "dpmsolverpp_3order": sample_dpmpp_3m,
    "dpm_fast": sample_dpm_fast,
    "dpm_adaptive": sample_dpm_adaptive,
    "dpmsolverpp_2s_ancestral": sample_dpmpp_2s_ancestral,
    "dpmsolverpp_sde": sample_dpmpp_sde,
    "dpmsolverpp_2m": sample_dpmpp_2m,
}

# every sampler supports segmented (chunked) dispatch with exact state
# carry; dpm_adaptive carries its while_loop solver state and the host
# loop watches the carried `finished` flag
CHUNKABLE_SAMPLERS = frozenset(SAMPLERS)

# the reference runs these enums through diffusers-style schedulers on
# integer "leading" timestep grids (common_scheduler + DDIMScheduler
# etc.); everything else uses the k-diffusion interpolated linspace grid
DIFFUSERS_GRID_SAMPLERS = frozenset({
    "ddim", "ddpm", "plms", "dpmsolverpp_1order", "dpmsolverpp_2order",
    "dpmsolverpp_3order"})

# proto enum value -> sampler key (generation_pb2.DiffusionSampler)
PROTO_SAMPLERS = {
    # enum 1 (SAMPLER_DDPM): the reference serves deterministic PLMS
    # here (PNDMScheduler skip_prk_steps); true ancestral DDPM remains
    # available as the direct sampler name "ddpm"
    0: "ddim", 1: "plms", 2: "k_euler", 3: "k_euler_ancestral", 4: "k_heun",
    5: "k_dpm_2", 6: "k_dpm_2_ancestral", 7: "k_lms",
    8: "k_dpmpp_2s_ancestral", 9: "k_dpmpp_2m", 10: "k_dpmpp_sde",
    500: "dpmsolverpp_1order", 501: "dpmsolverpp_2order",
    502: "dpmsolverpp_3order", 550: "dpm_fast", 551: "dpm_adaptive",
    552: "dpmsolverpp_2s_ancestral", 553: "dpmsolverpp_sde",
    554: "dpmsolverpp_2m",
}

# capability metadata for the engines API (reference
# gyre/pipeline/samplers.py:70-107 derives this by introspection)
SAMPLER_PROPERTIES = {
    name: {
        "supports_eta": name in ("ddim", "k_euler_ancestral",
                                 "k_dpm_2_ancestral", "k_dpmpp_2s_ancestral",
                                 "k_dpmpp_sde", "dpmsolverpp_2s_ancestral",
                                 "dpmsolverpp_sde"),
        "supports_churn": name in ("k_euler", "k_heun", "k_dpm_2"),
        "supports_sigma_limits": name.startswith("k_") or name.startswith("dpm"),
        "supports_karras_rho": name.startswith("k_") or name.startswith("dpm"),
        "supported_noise_types": ["normal", "brownian"]
        if "sde" in name else ["normal"],
    }
    for name in SAMPLERS
}


def init_carry(name: str, x) -> tuple:
    """Zero-initialized cross-step state for `name`, shaped like latents x
    (host-side helper for chunked dispatch's first segment)."""
    fn = SAMPLERS[name]
    if fn is sample_dpm_fast:
        # (x_seg, eps0, eps_r1): segment-start latent + cached eps of
        # the in-flight singlestep solve
        return (x, jnp.zeros_like(x), jnp.zeros_like(x))
    if fn is sample_dpmpp_2m:
        return (jnp.zeros_like(x),)
    if fn is sample_dpmpp_3m:
        return (jnp.zeros_like(x), jnp.zeros_like(x), jnp.asarray(1.0),
                jnp.asarray(1.0))
    if fn in (sample_lms, sample_plms):
        return (jnp.zeros((4,) + tuple(x.shape), x.dtype),)
    if fn is sample_dpm_adaptive:
        # (has_state, t, h, step, finished) — scalars; has_state=0 makes
        # the first segment derive t/h from the ramp
        z = jnp.asarray(0, jnp.int32)
        return (z, jnp.asarray(0.0), jnp.asarray(0.0), z, z)
    return ()


def sample(name: str, denoise, x, sigmas, noise_fn,
           p: SamplerParams | None = None, *, start=0, steps=None,
           carry=None, return_carry=False, first: bool | None = None):
    """`first` statically marks the segment containing global step 0 for
    samplers whose warmup differs from their steady state (plms'
    duplicate-timestep corrector); needed because `start` is traced
    inside the jitted chunk program and can't be branched on."""
    p = p or SamplerParams()
    kw = {"first": first} if SAMPLERS[name] is sample_plms else {}
    return SAMPLERS[name](denoise, x, sigmas, noise_fn, p, start=start,
                          steps=steps, carry=carry,
                          return_carry=return_carry, **kw)
