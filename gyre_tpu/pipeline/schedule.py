"""Diffusion noise schedules and sigma-space conversions.

The reference drives three scheduler families through one abstraction
(reference gyre/pipeline/common_scheduler.py:97-623). Here everything is
unified into k-diffusion sigma space: a `DiffusionSchedule` holds the
training alphas_cumprod table; samplers consume a precomputed descending
sigma ramp; alpha-space samplers (DDIM/DDPM) convert through
x_sigma = x_t / sqrt(alphas_cumprod). All ramps are built host-side with
numpy (they depend only on step count/options, never on data) so the jitted
sampler program sees only static-shaped constants.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DiffusionSchedule:
    """Training-time noise schedule (the model's beta schedule)."""

    alphas_cumprod: np.ndarray           # [T] float64
    prediction_type: str = "epsilon"     # "epsilon" | "v_prediction"

    @property
    def num_train_timesteps(self) -> int:
        return len(self.alphas_cumprod)

    @property
    def sigmas(self) -> np.ndarray:
        ac = self.alphas_cumprod
        return np.sqrt((1.0 - ac) / ac)

    @property
    def log_sigmas(self) -> np.ndarray:
        return np.log(self.sigmas)

    @property
    def sigma_min(self) -> float:
        return float(self.sigmas[0])

    @property
    def sigma_max(self) -> float:
        return float(self.sigmas[-1])


def scaled_linear_schedule(num_timesteps: int = 1000,
                           beta_start: float = 0.00085,
                           beta_end: float = 0.012,
                           prediction_type: str = "epsilon") -> DiffusionSchedule:
    """The SD family's "scaled_linear" beta schedule."""
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_timesteps,
                        dtype=np.float64) ** 2
    ac = np.cumprod(1.0 - betas)
    return DiffusionSchedule(alphas_cumprod=ac, prediction_type=prediction_type)


def linear_schedule(num_timesteps: int = 1000, beta_start: float = 0.0001,
                    beta_end: float = 0.02,
                    prediction_type: str = "epsilon") -> DiffusionSchedule:
    betas = np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)
    ac = np.cumprod(1.0 - betas)
    return DiffusionSchedule(alphas_cumprod=ac, prediction_type=prediction_type)


# ----------------------------------------------------------- t <-> sigma


def t_to_sigma_np(schedule: DiffusionSchedule, t: np.ndarray) -> np.ndarray:
    """Fractional timestep -> sigma by log-space interpolation."""
    log_sigmas = schedule.log_sigmas
    t = np.asarray(t, np.float64)
    low = np.floor(t).astype(int).clip(0, len(log_sigmas) - 1)
    high = np.ceil(t).astype(int).clip(0, len(log_sigmas) - 1)
    w = t - low
    return np.exp((1 - w) * log_sigmas[low] + w * log_sigmas[high])


def sigma_to_t(log_sigmas_j: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """sigma -> fractional timestep (for UNet conditioning), jit-safe.

    log_sigmas_j: the [T] log-sigma table as a jnp array (increasing).
    """
    log_sigma = jnp.log(sigma)
    t_grid = jnp.arange(log_sigmas_j.shape[0], dtype=jnp.float32)
    return jnp.interp(log_sigma, log_sigmas_j, t_grid)


# ------------------------------------------------------------- sigma ramps


def karras_ramp(sigma_min: float, sigma_max: float, steps: int,
                rho: float = 7.0) -> np.ndarray:
    """Karras et al. (2022) rho-spaced sigma ramp, descending, 0-terminated."""
    ramp = np.linspace(0, 1, steps)
    inv_rho = 1.0 / rho
    sigmas = (sigma_max ** inv_rho +
              ramp * (sigma_min ** inv_rho - sigma_max ** inv_rho)) ** rho
    return np.append(sigmas, 0.0)


def exponential_ramp(sigma_min: float, sigma_max: float,
                     steps: int) -> np.ndarray:
    sigmas = np.exp(np.linspace(np.log(sigma_max), np.log(sigma_min), steps))
    return np.append(sigmas, 0.0)


def build_sigmas(schedule: DiffusionSchedule, steps: int, *,
                 strength: float = 1.0,
                 karras_rho: float | None = None,
                 sigma_min: float | None = None,
                 sigma_max: float | None = None,
                 uniform_lambda: bool = False,
                 spacing: str = "linspace") -> np.ndarray:
    """The sigma ramp for a request: [steps*strength + 1] descending, last 0.

    img2img runs the tail of the full-step ramp (strength in (0,1]),
    matching the reference's schedule-truncation semantics
    (gyre/pipeline/common_scheduler.py:477-514, unified_pipeline img2img).

    uniform_lambda: steps uniform in lambda = -log(sigma) — the dpm_fast
    ramp (k-diffusion get_sigmas_exponential semantics used by
    sample_dpm_fast's t-spacing, reference sampler registry
    gyre/pipeline/samplers.py:24-67).

    spacing: "linspace" is the k-diffusion grid (fractional timesteps
    linspace(T-1..0), interpolated sigmas). "leading" is the diffusers
    integer grid the reference's DDIM/DDPM/DPMSolver++ enums run on:
    timesteps = round(arange(steps) * (T // steps))[::-1] + 1
    (reference schedulers/scheduling_ddim.py:197-203, steps_offset=1 as
    in every SD scheduler config). karras/exponential ramps override
    spacing, exactly as they override the grid in the reference.
    """
    smin = sigma_min if sigma_min else schedule.sigma_min
    smax = sigma_max if sigma_max else schedule.sigma_max
    if uniform_lambda:
        lam = np.linspace(-np.log(smax), -np.log(smin), steps)
        full = np.append(np.exp(-lam), 0.0)
    elif karras_rho:
        full = karras_ramp(smin, smax, steps, karras_rho)
    elif spacing == "leading":
        ratio = max(1, schedule.num_train_timesteps // steps)
        t = np.minimum((np.arange(steps) * ratio).round()[::-1] + 1,
                       schedule.num_train_timesteps - 1).astype(np.float64)
        full = np.append(t_to_sigma_np(schedule, t), 0.0)
    else:
        t = np.linspace(schedule.num_train_timesteps - 1, 0.0, steps)
        full = np.append(t_to_sigma_np(schedule, t), 0.0)
    if strength >= 1.0:
        return full
    # run the last ceil(steps*strength) steps
    n = max(1, int(round(steps * strength)))
    return full[len(full) - 1 - n:]


def timesteps_for_sigmas(schedule: DiffusionSchedule,
                         sigmas: np.ndarray) -> np.ndarray:
    """Continuous UNet timesteps for each non-terminal sigma."""
    log_sigmas = schedule.log_sigmas
    out = np.interp(np.log(np.maximum(sigmas[:-1], 1e-10)), log_sigmas,
                    np.arange(len(log_sigmas), dtype=np.float64))
    return out
