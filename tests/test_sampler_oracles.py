"""Sampler parity against the reference's own vendored torch schedulers.

The reference drives k-diffusion via vendored torch KSchedulers
(/root/reference/gyre/pipeline/kschedulers/). Loading them needs only a
2-line diffusers shim (ConfigMixin/register_to_config/SchedulerOutput),
so they serve as exact step-for-step oracles — the same technique as
tests/torch_oracles.py for model weights. Covers:

  * sigma-grid parity: our build_sigmas must reproduce the scheduler's
    fractional-timestep interpolated sigmas (reference
    scheduling_euler_discrete.py:94-103)
  * euler stepping parity on the oracle's own grid (churn 0)
  * LMS Adams-Bashforth coefficients vs scipy.integrate.quad (the
    diffusers LMSDiscreteScheduler's method)
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/gyre/pipeline/kschedulers"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present")


def _load_kschedulers():
    if "ksch.scheduling_euler_discrete" in sys.modules:
        return sys.modules["ksch.scheduling_euler_discrete"]
    # minimal diffusers shim (test-only)
    if "diffusers" not in sys.modules:
        import inspect

        diffusers = types.ModuleType("diffusers")
        cu = types.ModuleType("diffusers.configuration_utils")

        class ConfigMixin:
            pass

        def register_to_config(init):
            def wrapped(self, *args, **kwargs):
                sig = inspect.signature(init)
                bound = sig.bind(self, *args, **kwargs)
                bound.apply_defaults()
                cfg = dict(bound.arguments)
                cfg.pop("self", None)
                self.config = types.SimpleNamespace(**cfg)
                return init(self, *args, **kwargs)

            return wrapped

        cu.ConfigMixin = ConfigMixin
        cu.register_to_config = register_to_config
        su = types.ModuleType("diffusers.schedulers.scheduling_utils")

        class SchedulerOutput:
            def __init__(self, prev_sample):
                self.prev_sample = prev_sample

        su.SchedulerOutput = SchedulerOutput
        schedulers_pkg = types.ModuleType("diffusers.schedulers")
        schedulers_pkg.scheduling_utils = su
        diffusers.configuration_utils = cu
        diffusers.schedulers = schedulers_pkg
        sys.modules["diffusers"] = diffusers
        sys.modules["diffusers.configuration_utils"] = cu
        sys.modules["diffusers.schedulers"] = schedulers_pkg
        sys.modules["diffusers.schedulers.scheduling_utils"] = su

    pkg = types.ModuleType("ksch")
    pkg.__path__ = [REF]
    sys.modules["ksch"] = pkg
    for name in ("scheduling_utils", "scheduling_euler_discrete",
                 "scheduling_heun_discrete",
                 "scheduling_euler_ancestral_discrete"):
        spec = importlib.util.spec_from_file_location(
            f"ksch.{name}", os.path.join(REF, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ksch.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ksch.scheduling_euler_discrete"]


S0 = 1.0


def _ideal_x0(x, sigma):
    return x * (S0 ** 2) / (S0 ** 2 + sigma ** 2)


def test_sigma_grid_matches_reference_interpolation():
    """build_sigmas must reproduce the KScheduler fractional-timestep
    interpolation of the trained schedule's sigmas."""
    import jax.numpy as jnp  # noqa: F401  (jax config via conftest)

    from gyre_tpu.pipeline import schedule as sched

    mod = _load_kschedulers()
    for steps in (10, 20, 50):
        oracle = mod.EulerDiscreteScheduler(beta_schedule="scaled_linear")
        oracle.set_timesteps(steps)
        osig = oracle.sigmas.numpy()
        ours = sched.build_sigmas(sched.scaled_linear_schedule(), steps)
        np.testing.assert_allclose(np.asarray(ours), osig, rtol=2e-4,
                                   atol=2e-5,
                                   err_msg=f"steps={steps}")


def test_euler_stepping_matches_reference():
    """Our k_euler on the oracle's own sigma grid must match the vendored
    EulerDiscreteScheduler step-for-step (churn 0 => deterministic)."""
    import torch

    import jax.numpy as jnp

    from gyre_tpu.pipeline import samplers as S
    from gyre_tpu.utils import rng

    mod = _load_kschedulers()
    steps = 12
    oracle = mod.EulerDiscreteScheduler(beta_schedule="scaled_linear")
    oracle.set_timesteps(steps)
    sig = oracle.sigmas.numpy()

    x0 = np.random.RandomState(3).standard_normal((2, 8, 8, 4)) \
        .astype(np.float32)
    x_init = x0 * sig[0]

    # torch oracle loop
    xt = torch.from_numpy(x_init.copy())
    gen = torch.Generator()
    for i, t in enumerate(oracle.timesteps):
        sigma = float(oracle.sigmas[i])
        eps = (xt - _ideal_x0(xt, sigma)) / sigma
        xt = oracle.step(eps, t, xt, generator=gen).prev_sample
    expected = xt.numpy()

    # ours on the same grid
    keys = rng.keys_for_seeds(np.arange(2))

    def noise_fn(i, tag):
        return rng.batched_stream_normal(keys, tag, i, (8, 8, 4))

    ours = S.sample("k_euler", lambda x, s: _ideal_x0(x, s),
                    jnp.asarray(x_init), jnp.asarray(sig), noise_fn,
                    S.SamplerParams())
    np.testing.assert_allclose(np.asarray(ours), expected, rtol=2e-4,
                               atol=2e-5)


def test_heun_stepping_matches_reference():
    """Our k_heun vs the vendored HeunDiscreteScheduler (2nd-order
    correction via its noise_predictor callback), churn 0."""
    import torch

    import jax.numpy as jnp

    from gyre_tpu.pipeline import samplers as S
    from gyre_tpu.utils import rng

    _load_kschedulers()
    mod = sys.modules["ksch.scheduling_heun_discrete"]
    steps = 10
    oracle = mod.HeunDiscreteScheduler(beta_schedule="scaled_linear")
    oracle.set_timesteps(steps)
    sig = oracle.sigmas.numpy()

    x_init = (np.random.RandomState(5).standard_normal((2, 8, 8, 4))
              .astype(np.float32) * sig[0])

    def predictor(sample, t):
        sigma = float(oracle.sigmas[oracle.t_to_index(t)])
        return (sample - _ideal_x0(sample, sigma)) / sigma

    xt = torch.from_numpy(x_init.copy())
    gen = torch.Generator()
    for i, t in enumerate(oracle.timesteps):
        sigma = float(oracle.sigmas[i])
        eps = (xt - _ideal_x0(xt, sigma)) / sigma
        xt = oracle.step(eps, t, xt, generator=gen,
                         noise_predictor=predictor).prev_sample
    expected = xt.numpy()

    keys = rng.keys_for_seeds(np.arange(2))

    def noise_fn(i, tag):
        return rng.batched_stream_normal(keys, tag, i, (8, 8, 4))

    ours = S.sample("k_heun", lambda x, s: _ideal_x0(x, s),
                    jnp.asarray(x_init), jnp.asarray(sig), noise_fn,
                    S.SamplerParams())
    np.testing.assert_allclose(np.asarray(ours), expected, rtol=2e-4,
                               atol=2e-5)


def test_euler_ancestral_stepping_matches_reference():
    """Our k_euler_ancestral (eta=1) vs the vendored
    EulerAncestralDiscreteScheduler, with the oracle's torch.randn
    patched to replay OUR per-step rng streams — step math and noise
    application must agree exactly."""
    import torch

    import jax.numpy as jnp

    from gyre_tpu.pipeline import samplers as S
    from gyre_tpu.utils import rng

    _load_kschedulers()
    mod = sys.modules["ksch.scheduling_euler_ancestral_discrete"]
    steps = 10
    oracle = mod.EulerAncestralDiscreteScheduler(
        beta_schedule="scaled_linear")
    oracle.set_timesteps(steps)
    sig = oracle.sigmas.numpy()

    x_init = (np.random.RandomState(7).standard_normal((2, 8, 8, 4))
              .astype(np.float32) * sig[0])

    keys = rng.keys_for_seeds(np.arange(2))
    noise_seq = [np.asarray(
        rng.batched_stream_normal(keys, "anc", i, (8, 8, 4)))
        for i in range(steps)]

    calls = {"n": 0}
    real_randn = torch.randn

    def fake_randn(*args, **kwargs):
        out = torch.from_numpy(noise_seq[calls["n"]].copy())
        calls["n"] += 1
        return out

    xt = torch.from_numpy(x_init.copy())
    gen = torch.Generator()
    torch.randn = fake_randn
    try:
        for i, t in enumerate(oracle.timesteps):
            sigma = float(oracle.sigmas[i])
            eps = (xt - _ideal_x0(xt, sigma)) / sigma
            xt = oracle.step(eps, t, xt, generator=gen).prev_sample
    finally:
        torch.randn = real_randn
    expected = xt.numpy()
    assert calls["n"] == steps

    def noise_fn(i, tag):
        assert tag == "anc"
        return rng.batched_stream_normal(keys, tag, i, (8, 8, 4))

    ours = S.sample("k_euler_ancestral", lambda x, s: _ideal_x0(x, s),
                    jnp.asarray(x_init), jnp.asarray(sig), noise_fn,
                    S.SamplerParams(eta=1.0))
    np.testing.assert_allclose(np.asarray(ours), expected, rtol=2e-4,
                               atol=3e-5)


@pytest.mark.parametrize("warmup,cutoff", [
    (False, 0.0), (True, 0.1), (False, 0.1), (True, 0.0)])
def test_dpmpp_2m_matches_reference_patched_sampler(warmup, cutoff):
    """Our k_dpmpp_2m (the default serving sampler) vs the reference's
    own vendored patched sampler (gyre/pipeline/schedulers/
    sample_dpmpp_2m.py) step-for-step, across the warmup_lms /
    ddim_cutoff option grid (the reference registry default is
    warmup_lms=True + ddim_cutoff=0.1, reference samplers.py
    KDIFFUSION_SAMPLERS)."""
    import importlib.util as ilu

    import torch

    import jax.numpy as jnp

    from gyre_tpu.pipeline import samplers as S
    from gyre_tpu.pipeline import schedule as sched
    from gyre_tpu.utils import rng

    path = ("/root/reference/gyre/pipeline/schedulers/"
            "sample_dpmpp_2m.py")
    if not os.path.exists(path):
        pytest.skip("reference sampler not present")
    spec = ilu.spec_from_file_location("ref_dpmpp_2m", path)
    ref = ilu.module_from_spec(spec)
    spec.loader.exec_module(ref)

    sig = np.asarray(sched.build_sigmas(sched.scaled_linear_schedule(),
                                        12), np.float32)
    x_init = (np.random.RandomState(9).standard_normal((2, 8, 8, 4))
              .astype(np.float32) * sig[0])

    def torch_model(x, sigma_in, **kw):
        sigma = float(sigma_in.reshape(-1)[0])
        return _ideal_x0(x, sigma)

    expected = ref.sample_dpmpp_2m(
        torch_model, torch.from_numpy(x_init.copy()),
        torch.from_numpy(sig), disable=True, warmup_lms=warmup,
        ddim_cutoff=cutoff).numpy()

    keys = rng.keys_for_seeds(np.arange(2))

    def noise_fn(i, tag):
        return rng.batched_stream_normal(keys, tag, i, (8, 8, 4))

    ours = S.sample("k_dpmpp_2m", lambda x, s: _ideal_x0(x, s),
                    jnp.asarray(x_init), jnp.asarray(sig), noise_fn,
                    S.SamplerParams(warmup_lms=warmup,
                                    ddim_cutoff=cutoff))
    np.testing.assert_allclose(np.asarray(ours), expected, rtol=3e-4,
                               atol=3e-5)


def test_leading_grid_matches_vendored_ddim_scheduler():
    """build_sigmas(spacing='leading') must land on exactly the sigmas of
    the reference DDIMScheduler's integer timesteps (scheduling_ddim.py
    set_timesteps, steps_offset=1)."""
    _load_kschedulers()  # shim + a scheduler exposing alphas_cumprod
    mod = sys.modules["ksch.scheduling_euler_discrete"]
    oracle = mod.EulerDiscreteScheduler(beta_schedule="scaled_linear")
    acp = oracle.alphas_cumprod.numpy().astype(np.float64)

    from gyre_tpu.pipeline import schedule as sched

    for steps in (10, 20, 50):
        ratio = 1000 // steps
        t = (np.arange(steps) * ratio).round()[::-1].astype(int) + 1
        expected = np.sqrt((1 - acp[t]) / acp[t])
        ours = np.asarray(sched.build_sigmas(
            sched.scaled_linear_schedule(), steps, spacing="leading"))
        assert len(ours) == steps + 1 and ours[-1] == 0.0
        np.testing.assert_allclose(ours[:-1], expected, rtol=2e-4,
                                   atol=2e-5, err_msg=f"steps={steps}")


def test_ddim_trajectory_matches_vendored_scheduler():
    """Our sigma-space DDIM vs the reference's vendored timestep-space
    DDIMScheduler (eta 0), bridged by x_t = sqrt(acp_t) * x_sigma, on
    the same leading grid. Compared over all but the final step: the
    endpoint semantics intentionally differ (diffusers stops at
    final_alpha_cumprod = acp[0], i.e. leaves sigma_min-level noise;
    we denoise fully to x0)."""
    import torch

    import jax.numpy as jnp

    from gyre_tpu.pipeline import samplers as S
    from gyre_tpu.pipeline import schedule as sched
    from gyre_tpu.utils import rng

    _load_kschedulers()  # installs the diffusers shim
    # extend the shim for scheduling_ddim's extra imports
    du = types.ModuleType("diffusers.utils")

    class BaseOutput:
        pass

    du.BaseOutput = BaseOutput
    du.deprecate = lambda *a, **k: None
    sys.modules["diffusers.utils"] = du
    sys.modules["diffusers"].utils = du
    class _SchedulerMixin:  # object itself breaks the MRO as first base
        pass

    sys.modules["diffusers.schedulers.scheduling_utils"].SchedulerMixin = \
        _SchedulerMixin

    path = "/root/reference/gyre/pipeline/schedulers/scheduling_ddim.py"
    spec = importlib.util.spec_from_file_location("ref_ddim", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    steps = 10
    oracle = mod.DDIMScheduler(beta_start=0.00085, beta_end=0.012,
                               beta_schedule="scaled_linear",
                               clip_sample=False, set_alpha_to_one=False,
                               steps_offset=1)
    oracle.set_timesteps(steps)
    acp = oracle.alphas_cumprod.numpy().astype(np.float64)
    ts = oracle.timesteps.numpy()

    sig = np.asarray(sched.build_sigmas(
        sched.scaled_linear_schedule(), steps, spacing="leading"),
        np.float32)
    # sanity: the leading grid IS the oracle's timestep sigmas
    np.testing.assert_allclose(
        sig[:-1], np.sqrt((1 - acp[ts]) / acp[ts]), rtol=2e-4, atol=2e-5)

    x_init = (np.random.RandomState(11).standard_normal((2, 8, 8, 4))
              .astype(np.float32) * sig[0])

    # torch oracle loop over all but the last step, in x_t space
    xt = torch.from_numpy(x_init.copy()) * float(np.sqrt(acp[ts[0]]))
    for i, t in enumerate(ts[:-1]):
        a = float(acp[t])
        x_sigma = xt / np.sqrt(a)
        sigma = float(sig[i])
        eps = (x_sigma - _ideal_x0(x_sigma, sigma)) / sigma
        xt = oracle.step(eps.float(), int(t), xt, eta=0.0).prev_sample
    t_last = int(ts[-1])
    expected = (xt / np.sqrt(float(acp[t_last]))).numpy()

    keys = rng.keys_for_seeds(np.arange(2))

    def noise_fn(i, tag):
        return rng.batched_stream_normal(keys, tag, i, (8, 8, 4))

    ours = S.sample("ddim", lambda x, s: _ideal_x0(x, s),
                    jnp.asarray(x_init), jnp.asarray(sig), noise_fn,
                    S.SamplerParams(eta=0.0), steps=steps - 1)
    np.testing.assert_allclose(np.asarray(ours), expected, rtol=3e-4,
                               atol=3e-4)


def test_lms_coefficients_match_scipy_quad():
    """_lms_coefficients vs scipy.integrate.quad of the Lagrange basis —
    the diffusers LMSDiscreteScheduler method (reference samplers.py
    DIFFUSERS_SAMPLERS k_lms)."""
    from scipy import integrate

    from gyre_tpu.pipeline.samplers import _lms_coefficients

    sig = np.geomspace(14.6, 0.03, 16).astype(np.float64)
    sig = np.concatenate([sig, [0.0]])
    ours = _lms_coefficients(sig)
    order = 4
    for i in range(len(sig) - 1):
        cur = min(i + 1, order)
        for j in range(cur):
            def basis(t, i=i, j=j, cur=cur):
                prod = 1.0
                for k in range(cur):
                    if k == j:
                        continue
                    prod *= (t - sig[i - k]) / (sig[i - j] - sig[i - k])
                return prod

            ref, _ = integrate.quad(basis, sig[i], sig[i + 1])
            assert abs(ours[i, j] - ref) < 5e-4 + 5e-4 * abs(ref), \
                (i, j, ours[i, j], ref)


def _dpm_fast_oracle(x, sigma_min, sigma_max, n):
    """Independent numpy reimplementation of k-diffusion's
    dpm_solver_fast (eta=0): m = floor(n/3)+1 uniform-in-t segments,
    orders [3]*(m-2)+[2,1] when n%3==0 else [3]*(m-1)+[n%3], solved
    with the published singlestep DPM-Solver updates in t=-log(sigma)
    space. The reference maps SAMPLER_DPM_FAST to exactly this solver
    (gyre/pipeline/samplers.py:54)."""
    t_start, t_end = -np.log(sigma_max), -np.log(sigma_min)
    m = n // 3 + 1
    ts = np.linspace(t_start, t_end, m + 1)
    orders = [3] * (m - 2) + [2, 1] if n % 3 == 0 \
        else [3] * (m - 1) + [n % 3]

    def sig(t):
        return np.exp(-t)

    def eps_of(x, t):
        s = sig(t)
        return (x - np.asarray(_ideal_x0(x, s))) / s

    for i, order in enumerate(orders):
        t, tn = ts[i], ts[i + 1]
        h = tn - t
        eps = eps_of(x, t)
        if order == 1:
            x = x - sig(tn) * np.expm1(h) * eps
        elif order == 2:
            r1 = 0.5
            s1 = t + r1 * h
            u1 = x - sig(s1) * np.expm1(r1 * h) * eps
            eps_r1 = eps_of(u1, s1)
            x = x - sig(tn) * np.expm1(h) * eps \
                - sig(tn) / (2 * r1) * np.expm1(h) * (eps_r1 - eps)
        else:
            r1, r2 = 1 / 3, 2 / 3
            s1, s2 = t + r1 * h, t + r2 * h
            u1 = x - sig(s1) * np.expm1(r1 * h) * eps
            eps_r1 = eps_of(u1, s1)
            u2 = x - sig(s2) * np.expm1(r2 * h) * eps \
                - sig(s2) * (r2 / r1) * (np.expm1(r2 * h) / (r2 * h) - 1) \
                * (eps_r1 - eps)
            eps_r2 = eps_of(u2, s2)
            x = x - sig(tn) * np.expm1(h) * eps \
                - sig(tn) / r2 * (np.expm1(h) / h - 1) * (eps_r2 - eps)
    return x


@pytest.mark.parametrize("steps", [4, 6, 7, 9, 20])
def test_dpm_fast_matches_kdiffusion_algorithm(steps):
    """sample_dpm_fast must reproduce k-diffusion's dpm_solver_fast
    step-for-step (order-3/2/1 segment sequence), including the
    order-schedule edge cases (n%3 == 0, 1, 2)."""
    import jax.numpy as jnp

    from gyre_tpu.pipeline import samplers as S
    from gyre_tpu.utils import rng

    sigma_max, sigma_min = 14.6, 0.03
    x_init = (np.random.RandomState(5)
              .standard_normal((2, 8, 8, 4)).astype(np.float32)
              * sigma_max)
    expected = _dpm_fast_oracle(x_init.astype(np.float64), sigma_min,
                                sigma_max, steps)

    # our sampler reads only sigmas[0] and sigmas[n-1] (+ terminal 0)
    ts = np.linspace(-np.log(sigma_max), -np.log(sigma_min), steps)
    sig = np.concatenate([np.exp(-ts), [0.0]]).astype(np.float32)
    keys = rng.keys_for_seeds(np.arange(2))

    def noise_fn(i, tag):
        return rng.batched_stream_normal(keys, tag, i, (8, 8, 4))

    # k-diffusion's sample_dpm_fast defaults eta=0; the oracle
    # implements exactly that branch
    ours = S.sample("dpm_fast", lambda x, s: _ideal_x0(x, s),
                    jnp.asarray(x_init), jnp.asarray(sig), noise_fn,
                    S.SamplerParams(eta=0.0))
    # f32 sampler vs f64 oracle: longer order-3 chains accumulate a few
    # 1e-4-scale ulps (steps=9 worst case); algorithmic errors are 1e0+
    np.testing.assert_allclose(np.asarray(ours), expected, rtol=2e-3,
                               atol=1e-3)


def test_dpm_fast_chunked_equals_oneshot():
    """Chunk boundaries mid-segment must not change the result: the
    in-flight singlestep state rides the carry."""
    import jax.numpy as jnp

    from gyre_tpu.pipeline import samplers as S
    from gyre_tpu.utils import rng

    steps = 10
    sigma_max, sigma_min = 14.6, 0.03
    ts = np.linspace(-np.log(sigma_max), -np.log(sigma_min), steps)
    sig = jnp.asarray(np.concatenate([np.exp(-ts), [0.0]])
                      .astype(np.float32))
    x_init = jnp.asarray(np.random.RandomState(6)
                         .standard_normal((2, 8, 8, 4))
                         .astype(np.float32) * sigma_max)
    keys = rng.keys_for_seeds(np.arange(2))

    def noise_fn(i, tag):
        return rng.batched_stream_normal(keys, tag, i, (8, 8, 4))

    den = lambda x, s: _ideal_x0(x, s)  # noqa: E731
    one = S.sample("dpm_fast", den, x_init, sig, noise_fn,
                   S.SamplerParams())
    x = x_init
    carry = S.init_carry("dpm_fast", x)
    done = 0
    for seg in (3, 4, 3):  # boundaries at 3 and 7: mid-segment splits
        x, carry = S.sample("dpm_fast", den, x, sig, noise_fn,
                            S.SamplerParams(), start=done, steps=seg,
                            carry=carry, return_carry=True)
        done += seg
    np.testing.assert_allclose(np.asarray(x), np.asarray(one),
                               rtol=1e-5, atol=1e-5)


def test_plms_trajectory_matches_pndm_oracle():
    """SAMPLER_DDPM serves sigma-space PLMS incl. diffusers'
    duplicate-timestep first-step corrector. Oracle: a faithful numpy
    implementation of PNDMScheduler(skip_prk_steps=True) step_plms —
    the exact published equations (timestep duplication, counter-gated
    ets history, _get_prev_sample epsilon coefficients) the reference
    maps the enum to (/root/reference/gyre/pipeline/samplers.py:26).
    Bridged by x_t = sqrt(acp_t) * x_sigma on the same leading grid;
    compared over all but the final step (endpoint semantics differ:
    diffusers stops at final_alpha_cumprod, we denoise to x0)."""
    import jax.numpy as jnp

    from gyre_tpu.pipeline import samplers as S
    from gyre_tpu.pipeline import schedule as sched
    from gyre_tpu.utils import rng

    steps = 12
    n_train = 1000
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, n_train,
                        dtype=np.float64) ** 2
    acp = np.cumprod(1.0 - betas)
    ratio = n_train // steps
    ts_asc = (np.arange(steps) * ratio).round().astype(int) + 1
    # skip_prk plms timesteps: duplicate the second-from-last ascending
    # entry, then reverse (scheduling_pndm.set_timesteps)
    ts = np.concatenate([ts_asc[:-1], ts_asc[-2:-1], ts_asc[-1:]])[::-1]

    sig = np.asarray(sched.build_sigmas(
        sched.scaled_linear_schedule(), steps, spacing="leading"),
        np.float64)
    np.testing.assert_allclose(
        sig[:-1], np.sqrt((1 - acp[ts_asc[::-1]]) / acp[ts_asc[::-1]]),
        rtol=2e-4, atol=2e-5)

    def prev_sample(sample, t, t_prev, e):
        a_t = acp[t]
        a_prev = acp[t_prev] if t_prev >= 0 else acp[0]
        b_t, b_prev = 1 - a_t, 1 - a_prev
        coeff = (a_prev / a_t) ** 0.5
        denom = a_t * b_prev ** 0.5 + (a_t * b_t * a_prev) ** 0.5
        return coeff * sample - (a_prev - a_t) * e / denom

    x_init = (np.random.RandomState(5).standard_normal((2, 8, 8, 4))
              .astype(np.float64) * sig[0])

    # ---- numpy PNDM oracle in x_t space, over all but the last step
    xt = x_init * np.sqrt(acp[ts[0]])
    ets, cur_sample, counter = [], None, 0
    for t in ts[:-1]:
        t = int(t)
        a = acp[t]
        x_sigma = xt / np.sqrt(a)
        sigma = np.sqrt((1 - a) / a)
        e = (x_sigma - np.asarray(_ideal_x0(x_sigma, sigma))) / sigma
        t_prev = t - ratio
        if counter == 1:
            t_prev, t = t, t + ratio
        else:
            ets.append(e)
        if len(ets) == 1 and counter == 0:
            cur_sample = xt
        elif len(ets) == 1 and counter == 1:
            e = (e + ets[-1]) / 2
            xt = cur_sample
        elif len(ets) == 2:
            e = (3 * ets[-1] - ets[-2]) / 2
        elif len(ets) == 3:
            e = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
        else:
            e = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3]
                 - 9 * ets[-4]) / 24
        xt = prev_sample(xt, t, t_prev, e)
        counter += 1
    # ts[:-1] has steps entries; the last consumed pair ends at ts[-1]
    expected = xt / np.sqrt(acp[int(ts[-1])])

    keys = rng.keys_for_seeds(np.arange(2))

    def noise_fn(i, tag):
        return rng.batched_stream_normal(keys, tag, i, (8, 8, 4))

    ours = S.sample("plms", lambda x, s: _ideal_x0(x, s),
                    jnp.asarray(x_init, jnp.float32),
                    jnp.asarray(sig, jnp.float32), noise_fn,
                    S.SamplerParams(), steps=steps - 1)
    np.testing.assert_allclose(np.asarray(ours), expected, rtol=2e-3,
                               atol=2e-3)


def test_plms_chunked_equals_oneshot():
    """Chunked dispatch (corrector in the first segment, ets carried)
    must be bit-close to the single-scan run."""
    import jax.numpy as jnp

    from gyre_tpu.pipeline import samplers as S
    from gyre_tpu.pipeline import schedule as sched
    from gyre_tpu.utils import rng

    steps = 10
    sig = jnp.asarray(sched.build_sigmas(
        sched.scaled_linear_schedule(), steps, karras_rho=7.0),
        jnp.float32)
    x = (np.random.RandomState(2).standard_normal((2, 8, 8, 4))
         .astype(np.float32) * float(sig[0]))
    keys = rng.keys_for_seeds(np.arange(2))

    def noise_fn(i, tag):
        return rng.batched_stream_normal(keys, tag, i, (8, 8, 4))

    dn = lambda xx, s: _ideal_x0(xx, s)
    oneshot = S.sample("plms", dn, jnp.asarray(x), sig, noise_fn,
                       S.SamplerParams())
    xc = jnp.asarray(x)
    carry = S.init_carry("plms", xc)
    done = 0
    for seg in (3, 4, 3):
        xc, carry = S.sample("plms", dn, xc, sig, noise_fn,
                             S.SamplerParams(), start=done, steps=seg,
                             carry=carry, return_carry=True,
                             first=done == 0)
        done += seg
    np.testing.assert_allclose(np.asarray(xc), np.asarray(oneshot),
                               rtol=1e-5, atol=1e-5)
