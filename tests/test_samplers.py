"""Sampler parity: JAX lax.scan samplers vs the reference torch samplers
driven by an identical toy x0-prediction model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ns2vc_tpu.diffusion import (
    NoiseSchedule, ddim_sample, dpmpp_2m_sample, unipc_sample,
)
from tests.ref_oracle import load_reference_samplers


def _toy_x0_np(x, t):
    """Deterministic toy x0 model: identical math in torch and jax.
    t is the discrete-time label in [0, 1000)."""
    w = np.cos(np.asarray(t, np.float64) / 1000.0)
    return None  # not used; kept for documentation


def _toy_torch(x, t, **kw):
    w = torch.cos(t.float() / 1000.0).reshape(-1, *([1] * (x.dim() - 1)))
    return torch.tanh(x) * w + 0.1 * x


def _toy_jax(x, t):
    w = jnp.cos(t.astype(jnp.float32) / 1000.0).reshape(
        (-1,) + (1,) * (x.ndim - 1))
    return jnp.tanh(x) * w + 0.1 * x


@pytest.fixture(scope="module")
def schedule():
    return NoiseSchedule(1000)


@pytest.fixture(scope="module")
def ref_samplers(reference_dir):
    return load_reference_samplers()


def _ref_setup(ref_mod, schedule):
    betas = torch.tensor(schedule.betas, dtype=torch.float32)
    ns = ref_mod.NoiseScheduleVP(schedule="discrete", betas=betas)
    model_fn = ref_mod.model_wrapper(_toy_torch, ns, model_type="x_start",
                                     model_kwargs={})
    return ns, model_fn


class TestScheduleParity:
    def test_marginals_match_reference(self, schedule, ref_samplers):
        dpm, _ = ref_samplers
        betas = torch.tensor(schedule.betas, dtype=torch.float32)
        ns = dpm.NoiseScheduleVP(schedule="discrete", betas=betas)
        t = np.linspace(1.0 / 1000, 1.0, 37)
        tt = torch.tensor(t, dtype=torch.float32)
        np.testing.assert_allclose(schedule.marginal_log_alpha(t),
                                   ns.marginal_log_mean_coeff(tt).numpy(),
                                   atol=2e-5)
        np.testing.assert_allclose(schedule.marginal_std(t),
                                   ns.marginal_std(tt).numpy(), atol=2e-5)
        np.testing.assert_allclose(schedule.marginal_lambda(t),
                                   ns.marginal_lambda(tt).numpy(), atol=2e-4)


class TestDPMSolverParity:
    @pytest.mark.parametrize("steps,order", [(10, 1), (10, 2), (40, 2),
                                             (12, 3), (30, 3)])
    def test_multistep(self, schedule, ref_samplers, steps, order):
        dpm, _ = ref_samplers
        ns, model_fn = _ref_setup(dpm, schedule)
        solver = dpm.DPM_Solver(model_fn, ns, algorithm_type="dpmsolver++")
        torch.manual_seed(0)
        x = torch.randn(2, 4, 24)
        want = solver.sample(x.clone(), steps=steps, order=order,
                             skip_type="time_uniform",
                             method="multistep").numpy()
        got = np.asarray(dpmpp_2m_sample(
            _toy_jax, jnp.asarray(x.numpy()), schedule, steps=steps,
            order=order))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestUniPCParity:
    @pytest.mark.parametrize("steps,order", [(5, 1), (5, 2), (30, 2),
                                             (8, 3), (30, 3)])
    def test_bh2(self, schedule, ref_samplers, steps, order):
        _, unipc_mod = ref_samplers
        ns, model_fn = _ref_setup(unipc_mod, schedule)
        solver = unipc_mod.UniPC(model_fn, ns, variant="bh2")
        torch.manual_seed(1)
        # batch 1: the reference uni_pc model_wrapper lacks the dim-expansion
        # of dpm_solver's (uni_pc.py:191) and only broadcasts for B=1 — which
        # is how NS2VC invokes it (model.py:666-687)
        x = torch.randn(1, 4, 24)
        want = solver.sample(x.clone(), steps=steps, order=order,
                             skip_type="time_uniform",
                             method="multistep").numpy()
        got = np.asarray(unipc_sample(
            _toy_jax, jnp.asarray(x.numpy()), schedule, steps=steps,
            order=order))
        np.testing.assert_allclose(got, want, atol=1e-4)

    @pytest.mark.parametrize("steps,order", [(5, 1), (5, 2), (30, 2),
                                             (8, 3), (30, 3)])
    def test_bh1(self, schedule, ref_samplers, steps, order):
        """bh1 variant: B_h = hh (reference uni_pc.py:510-511)."""
        _, unipc_mod = ref_samplers
        ns, model_fn = _ref_setup(unipc_mod, schedule)
        solver = unipc_mod.UniPC(model_fn, ns, variant="bh1")
        torch.manual_seed(2)
        x = torch.randn(1, 4, 24)
        want = solver.sample(x.clone(), steps=steps, order=order,
                             skip_type="time_uniform",
                             method="multistep").numpy()
        got = np.asarray(unipc_sample(
            _toy_jax, jnp.asarray(x.numpy()), schedule, steps=steps,
            order=order, variant="bh1"))
        np.testing.assert_allclose(got, want, atol=1e-4)

    @pytest.mark.parametrize("steps,order", [(5, 1), (5, 2), (30, 2),
                                             (8, 3), (30, 3)])
    def test_vary_coeff(self, schedule, ref_samplers, steps, order):
        """vary_coeff variant (reference uni_pc.py:369-469), incl. its
        corrector loop-variable quirk at uni_pc.py:466-468."""
        _, unipc_mod = ref_samplers
        ns, model_fn = _ref_setup(unipc_mod, schedule)
        solver = unipc_mod.UniPC(model_fn, ns, variant="vary_coeff")
        torch.manual_seed(3)
        x = torch.randn(1, 4, 24)
        want = solver.sample(x.clone(), steps=steps, order=order,
                             skip_type="time_uniform",
                             method="multistep").numpy()
        got = np.asarray(unipc_sample(
            _toy_jax, jnp.asarray(x.numpy()), schedule, steps=steps,
            order=order, variant="vary_coeff"))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestDDIM:
    def test_recovers_gaussian_mean(self, schedule):
        """DDIM with an exact-posterior x0 model on N(mu, I) data must land
        near mu (analytic sanity: x0_hat = (x + sqrt(1-acp)* ... ) — we use
        the Bayes-optimal x0 predictor for known Gaussian data)."""
        mu = 3.0
        acp = jnp.asarray(schedule.alphas_cumprod, jnp.float32)

        def x0_fn(x, t):
            t = t.astype(jnp.int32)
            a = acp[t].reshape((-1,) + (1,) * (x.ndim - 1))
            # posterior mean of x0 given x_t for x0 ~ N(mu, 0) (point mass)
            return jnp.full_like(x, mu)

        rng = jax.random.PRNGKey(0)
        x_T = jax.random.normal(rng, (4, 3, 8))
        out = np.asarray(ddim_sample(x0_fn, x_T, schedule, steps=50))
        np.testing.assert_allclose(out, mu, atol=1e-3)

    def test_matches_reference_ddim_math(self, schedule):
        """Cross-check one DDIM trajectory against a NumPy re-execution of
        the reference update equations (model.py:563-603)."""
        steps = 25
        n = schedule.num_timesteps
        times = np.trunc(np.linspace(-1.0, n - 1, steps + 1)).astype(int)
        pairs = list(zip(times[::-1][:-1], times[::-1][1:]))
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 2, 6)).astype(np.float32)
        x_jax = jnp.asarray(x)

        def x0_np(x, t):
            return np.tanh(x) * np.cos(t / 1000.0) + 0.1 * x

        xi = x.copy()
        for t, tn in pairs:
            x0 = x0_np(xi, float(t))
            pred_noise = ((schedule.sqrt_recip_alphas_cumprod[t] * xi - x0)
                          / schedule.sqrt_recipm1_alphas_cumprod[t])
            if tn < 0:
                xi = x0
                continue
            alpha_next = schedule.alphas_cumprod[tn]
            xi = (x0 * np.sqrt(alpha_next)
                  + np.sqrt(1 - alpha_next) * pred_noise).astype(np.float32)

        got = np.asarray(ddim_sample(_toy_jax, x_jax, schedule, steps=steps))
        np.testing.assert_allclose(got, xi, atol=1e-4)
