"""Task definitions: (prior, simulator, dims, optional analytic posterior).

Simulators are pure ``sim(rng, theta) -> x`` functions (jit/vmap-safe).
Reference analogs: two moons (demo.ipynb cell 2), gaussian linear with
analytic posterior ground truth (evaluate_ropefm.py:505-585 computes the
analytic Gaussian posterior the same way), SLCP / Lotka-Volterra / SIR from
BASELINE.json's config list.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..distributions import BoxUniform, Distribution, MultivariateNormal, Normal


@dataclasses.dataclass
class Task:
    name: str
    prior: Distribution
    simulator: Callable[[jax.Array, jnp.ndarray], jnp.ndarray]
    dim_theta: int
    dim_x: int
    # Analytic conditional posterior sampler, if one exists:
    # (rng, x_o, n) -> [n, dim_theta]
    posterior_sampler: Optional[Callable] = None
    # Exact posterior log-density, when available in closed form:
    # (x_o, theta [n, dim_theta]) -> [n]. Ground truth for validating the
    # estimator's log_prob modes (reference semantics: npe_pfn.py:462-570).
    posterior_log_prob: Optional[Callable] = None
    # Set when x is a flattened image: the eval harness then scores joint
    # C2ST with a TRAINED conv discriminator (reference trains ConvNN1D/2D
    # classifiers for such tasks, evaluate_ropefm_batched.py:118-304).
    x_image_shape: Optional[tuple] = None

    def simulate(self, rng: jax.Array, num: int):
        """Draw (θ, x) pairs on device."""
        k1, k2 = jax.random.split(rng)
        theta = self.prior.sample(k1, (num,))
        keys = jax.random.split(k2, num)
        x = jax.jit(jax.vmap(self.simulator))(keys, theta)
        return theta, x


# --------------------------------------------------------------------------
# Two Moons (2D θ, 2D x) — sbibm formulation; demo.ipynb cell 2 analog.
# --------------------------------------------------------------------------


def _two_moons_sim(rng, theta):
    ka, kr = jax.random.split(rng)
    alpha = jax.random.uniform(ka, (), minval=-math.pi / 2, maxval=math.pi / 2)
    r = 0.1 + 0.01 * jax.random.normal(kr, ())
    p = jnp.array([r * jnp.cos(alpha) + 0.25, r * jnp.sin(alpha)])
    ang = jnp.array(
        [
            -jnp.abs(theta[0] + theta[1]) / jnp.sqrt(2.0),
            (-theta[0] + theta[1]) / jnp.sqrt(2.0),
        ]
    )
    return p + ang


def _two_moons_log_likelihood(theta: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Exact log p(x|θ) for the two-moons simulator: the crescent point
    p = x - ang(θ) has polar density p(r, α) = N(r; 0.1, 0.01)·U(α; ±π/2)
    with Jacobian 1/r. theta: [..., 2]; x: [2]."""
    ang = jnp.stack(
        [
            -jnp.abs(theta[..., 0] + theta[..., 1]) / jnp.sqrt(2.0),
            (-theta[..., 0] + theta[..., 1]) / jnp.sqrt(2.0),
        ],
        axis=-1,
    )
    p = x - ang
    px = p[..., 0] - 0.25
    py = p[..., 1]
    r = jnp.sqrt(px**2 + py**2)
    alpha = jnp.arctan2(py, px)
    log_r = -0.5 * ((r - 0.1) / 0.01) ** 2 - math.log(0.01 * math.sqrt(2 * math.pi))
    log_alpha = jnp.where(
        (alpha > -math.pi / 2) & (alpha < math.pi / 2), -math.log(math.pi), -jnp.inf
    )
    return log_r + log_alpha - jnp.log(jnp.maximum(r, 1e-12))


def _two_moons_posterior_sampler(rng, x_o, n, grid: int = 512):
    """Exact posterior samples via a dense grid over the box prior —
    ground truth for C2ST on a genuinely multimodal task."""
    g = (jnp.arange(grid) + 0.5) / grid * 2.0 - 1.0
    tt = jnp.stack(jnp.meshgrid(g, g, indexing="ij"), axis=-1).reshape(-1, 2)
    logp = _two_moons_log_likelihood(tt, x_o)
    k_cat, k_jit = jax.random.split(rng)
    idx = jax.random.categorical(k_cat, logp, shape=(n,))
    cell = 2.0 / grid
    jitter = (jax.random.uniform(k_jit, (n, 2)) - 0.5) * cell
    return tt[idx] + jitter


def two_moons() -> Task:
    prior = BoxUniform(low=-jnp.ones(2), high=jnp.ones(2))
    return Task(
        "two_moons", prior, _two_moons_sim, 2, 2, _two_moons_posterior_sampler
    )


# --------------------------------------------------------------------------
# Gaussian Linear (10D) — analytic posterior available
# (reference computes it at evaluate_ropefm.py:505-585).
# --------------------------------------------------------------------------


def gaussian_linear(dim: int = 10, prior_scale: float = 1.0, noise_scale: float = 0.6) -> Task:
    prior = Normal(loc=jnp.zeros(dim), scale=prior_scale * jnp.ones(dim))

    def sim(rng, theta):
        return theta + noise_scale * jax.random.normal(rng, theta.shape)

    # Conjugate posterior: N(x * s_p^2/(s_p^2+s_n^2), (1/s_p^2 + 1/s_n^2)^-1)
    post_var = 1.0 / (1.0 / prior_scale**2 + 1.0 / noise_scale**2)
    coef = post_var / noise_scale**2

    def posterior_sampler(rng, x_o, n):
        mu = coef * x_o
        return mu + jnp.sqrt(post_var) * jax.random.normal(rng, (n, dim))

    def posterior_log_prob(x_o, theta):
        mu = coef * x_o
        return jnp.sum(
            -0.5 * (theta - mu) ** 2 / post_var
            - 0.5 * jnp.log(2 * jnp.pi * post_var),
            axis=-1,
        )

    return Task(
        f"gaussian_linear_{dim}d", prior, sim, dim, dim, posterior_sampler,
        posterior_log_prob=posterior_log_prob,
    )


# --------------------------------------------------------------------------
# SLCP (5D θ, 8D x): simple likelihood, complex posterior (sbibm).
# --------------------------------------------------------------------------


def _slcp_sim(rng, theta):
    m = theta[:2]
    s1 = theta[2] ** 2
    s2 = theta[3] ** 2
    rho = jnp.tanh(theta[4])
    cov = jnp.array(
        [[s1**2, rho * s1 * s2], [rho * s1 * s2, s2**2]]
    ) + 1e-6 * jnp.eye(2)
    chol = jnp.linalg.cholesky(cov)
    eps = jax.random.normal(rng, (4, 2))
    return (m[None, :] + eps @ chol.T).reshape(8)


def _slcp_log_likelihood(theta: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Exact log p(x|θ): four iid bivariate normals. theta [..., 5], x [8]."""
    m = theta[..., :2]
    s1 = theta[..., 2] ** 2
    s2 = theta[..., 3] ** 2
    rho = jnp.tanh(theta[..., 4])
    v11 = s1**2 + 1e-6
    v22 = s2**2 + 1e-6
    v12 = rho * s1 * s2
    det = v11 * v22 - v12**2
    obs = x.reshape(4, 2)
    d1 = obs[:, 0] - m[..., None, 0]  # [..., 4]
    d2 = obs[:, 1] - m[..., None, 1]
    maha = (
        v22[..., None] * d1**2 - 2 * v12[..., None] * d1 * d2 + v11[..., None] * d2**2
    ) / det[..., None]
    return jnp.sum(
        -0.5 * maha - 0.5 * jnp.log(det[..., None]) - math.log(2 * math.pi), axis=-1
    )


def _slcp_posterior_sampler(rng, x_o, n, num_chains: int = 256, num_steps: int = 4000):
    """Reference posterior via vectorized random-walk Metropolis over the
    box prior (exact likelihood above). Burn-in half; thin to n draws."""
    lo, hi = -3.0 * jnp.ones(5), 3.0 * jnp.ones(5)
    k_init, k_mh = jax.random.split(rng)
    pos = jax.random.uniform(k_init, (num_chains, 5), minval=lo, maxval=hi)
    logp = _slcp_log_likelihood(pos, x_o)
    step_scale = 0.25

    def mh_step(carry, key):
        pos, logp = carry
        k1, k2 = jax.random.split(key)
        prop = pos + step_scale * jax.random.normal(k1, pos.shape)
        inside = jnp.all((prop >= lo) & (prop <= hi), axis=-1)
        logp_prop = jnp.where(inside, _slcp_log_likelihood(prop, x_o), -jnp.inf)
        accept = jnp.log(jax.random.uniform(k2, (num_chains,))) < (logp_prop - logp)
        pos = jnp.where(accept[:, None], prop, pos)
        logp = jnp.where(accept, logp_prop, logp)
        return (pos, logp), pos

    keys = jax.random.split(k_mh, num_steps)
    _, chain = jax.lax.scan(mh_step, (pos, logp), keys)
    chain = chain[num_steps // 2 :]  # burn-in
    flat = chain.reshape(-1, 5)
    idx = jax.random.permutation(jax.random.fold_in(rng, 1), flat.shape[0])[:n]
    return flat[idx]


def slcp() -> Task:
    prior = BoxUniform(low=-3.0 * jnp.ones(5), high=3.0 * jnp.ones(5))
    return Task("slcp", prior, _slcp_sim, 5, 8, _slcp_posterior_sampler)


# --------------------------------------------------------------------------
# Lotka-Volterra (4D θ) — ODE integrated with a fixed-step RK4 under scan
# (jit/vmap on TPU; BASELINE.json config 4).
# --------------------------------------------------------------------------


def _lv_sim(rng, theta, t_max=20.0, num_steps=200, num_obs=10):
    alpha, beta, gamma, delta = jnp.exp(theta)
    dt = t_max / num_steps

    def deriv(state):
        x, y = state
        dx = alpha * x - beta * x * y
        dy = -gamma * y + delta * x * y
        return jnp.array([dx, dy])

    def rk4(state, _):
        k1 = deriv(state)
        k2 = deriv(state + 0.5 * dt * k1)
        k3 = deriv(state + 0.5 * dt * k2)
        k4 = deriv(state + dt * k3)
        new = state + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        new = jnp.clip(new, 1e-4, 1e4)
        return new, new

    init = jnp.array([30.0, 1.0])
    _, traj = jax.lax.scan(rk4, init, None, length=num_steps)
    idx = jnp.linspace(0, num_steps - 1, num_obs).astype(jnp.int32)
    obs = traj[idx]  # [num_obs, 2]
    noise = jax.random.normal(rng, obs.shape) * 0.1
    return (jnp.log(obs + 1.0) + noise).reshape(-1)  # 20D summary


def lotka_volterra() -> Task:
    # Log-space priors around classical parameter magnitudes.
    loc = jnp.log(jnp.array([0.8, 0.08, 0.8, 0.02]))
    prior = Normal(loc=loc, scale=0.3 * jnp.ones(4))
    return Task("lotka_volterra", prior, _lv_sim, 4, 20)


# --------------------------------------------------------------------------
# SIR epidemic model (2D θ: log beta, log gamma) — BASELINE.json config 5.
# --------------------------------------------------------------------------


def _sir_sim(rng, theta, population=1000.0, t_max=50.0, num_steps=200, num_obs=10):
    beta, gamma = jnp.exp(theta)
    dt = t_max / num_steps

    def deriv(state):
        s, i = state
        ds = -beta * s * i / population
        di = beta * s * i / population - gamma * i
        return jnp.array([ds, di])

    def rk4(state, _):
        k1 = deriv(state)
        k2 = deriv(state + 0.5 * dt * k1)
        k3 = deriv(state + 0.5 * dt * k2)
        k4 = deriv(state + dt * k3)
        new = jnp.clip(state + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4), 0.0, population)
        return new, new

    init = jnp.array([population - 1.0, 1.0])
    _, traj = jax.lax.scan(rk4, init, None, length=num_steps)
    idx = jnp.linspace(0, num_steps - 1, num_obs).astype(jnp.int32)
    infected = traj[idx, 1]
    # Binomial-ish observation noise via Gaussian approx (smooth, jittable).
    p = jnp.clip(infected / population, 1e-6, 1 - 1e-6)
    n_trials = 1000.0
    mean, sd = n_trials * p, jnp.sqrt(n_trials * p * (1 - p))
    obs = mean + sd * jax.random.normal(rng, p.shape)
    return obs / n_trials


def sir() -> Task:
    prior = Normal(
        loc=jnp.array([jnp.log(0.4), jnp.log(0.125)]), scale=jnp.array([0.5, 0.2])
    )
    return Task("sir", prior, _sir_sim, 2, 10)


# --------------------------------------------------------------------------
# Damped pendulum (3D θ: log length, log damping, initial angle) — the
# reference's RoPEFM "pendulum" task is data-file-driven
# (evaluate_ropefm.py:327-366); this is a self-contained simulator analog.
# --------------------------------------------------------------------------


def _pendulum_sim(rng, theta, t_max=10.0, num_steps=200, num_obs=20, g=9.81):
    length = jnp.exp(theta[0])
    damping = jnp.exp(theta[1])
    angle0 = theta[2]
    dt = t_max / num_steps

    def deriv(state):
        ang, vel = state
        return jnp.array([vel, -(g / length) * jnp.sin(ang) - damping * vel])

    def rk4(state, _):
        k1 = deriv(state)
        k2 = deriv(state + 0.5 * dt * k1)
        k3 = deriv(state + 0.5 * dt * k2)
        k4 = deriv(state + dt * k3)
        new = state + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        return new, new[0]

    init = jnp.array([angle0, 0.0])
    _, traj = jax.lax.scan(rk4, init, None, length=num_steps)
    idx = jnp.linspace(0, num_steps - 1, num_obs).astype(jnp.int32)
    obs = traj[idx]
    return obs + 0.05 * jax.random.normal(rng, obs.shape)


def pendulum() -> Task:
    prior = BoxUniform(
        low=jnp.array([-0.7, -3.0, 0.2]), high=jnp.array([0.7, -0.5, 1.5])
    )
    return Task("pendulum", prior, _pendulum_sim, 3, 20)


# --------------------------------------------------------------------------
# Wind tunnel analog (1D θ -> 16D x): the reference's wind_tunnel task
# infers the angle of attack α ∈ [0°, 45°] from pressure measurements
# (evaluate_ropefm.py:448-460; the measurement data artifacts are not in the
# reference repo, so this analog replaces them with a synthetic airfoil
# pressure-tap simulator: thin-airfoil lift with a smooth stall transition
# around 20°, chordwise suction profile, heteroscedastic sensor noise).
# Joint-metric evaluation (no tractable posterior), like pendulum.
# --------------------------------------------------------------------------


def _wind_tunnel_sim(rng, theta, num_taps=16, noise=0.05):
    alpha = theta[0] * jnp.pi / 180.0
    s = jnp.linspace(0.05, 0.95, num_taps)  # chordwise tap positions
    # Lift coefficient: thin-airfoil slope pre-stall, flat-plate post-stall,
    # blended smoothly at ~20 degrees.
    stall = jax.nn.sigmoid((theta[0] - 20.0) / 2.5)
    cl = (1.0 - stall) * 2.0 * jnp.pi * jnp.sin(alpha) * jnp.cos(alpha) \
        + stall * 1.1 * jnp.sin(2.0 * alpha)
    # Suction-side pressure-coefficient distribution: leading-edge peak
    # decaying toward the trailing edge, scaled by lift; stall flattens it.
    g = jnp.sqrt(jnp.maximum(1.0 - s, 0.0) / (s + 0.05))
    g = g / g.sum() * num_taps / 4.0
    # Separated flow adds a near-uniform base suction over the aft taps —
    # this keeps pre- and post-stall angles with equal lift distinguishable.
    cp = -cl * g * (1.0 - 0.5 * stall) - 0.2 * (1.0 - s) - 0.45 * stall * s
    # Sensor noise grows in the separated (stalled) regime.
    sigma = noise * (1.0 + 2.0 * stall)
    return cp + sigma * jax.random.normal(rng, cp.shape)


def wind_tunnel() -> Task:
    prior = BoxUniform(low=jnp.array([0.0]), high=jnp.array([45.0]))
    return Task("wind_tunnel", prior, _wind_tunnel_sim, 1, 16)


# --------------------------------------------------------------------------
# Gaussian bump image task (3D θ -> 1024-D image): high-dimensional
# observation exercising the embedding-net path, like the reference's
# light_tunnel image task (12288-D, RandomProjection to 128;
# evaluate_ropefm_batched.py:61-111).
# --------------------------------------------------------------------------


def _bump_sim(rng, theta, size=32):
    cx = theta[0] * 10.0 + 16.0
    cy = theta[1] * 10.0 + 16.0
    sig = jnp.exp(theta[2]) * 3.0 + 1.0
    ii = jnp.arange(size)[:, None]
    jj = jnp.arange(size)[None, :]
    img = jnp.exp(-((ii - cy) ** 2 + (jj - cx) ** 2) / (2.0 * sig**2))
    img = img + 0.05 * jax.random.normal(rng, (size, size))
    return img.reshape(-1)


def gaussian_bump_image() -> Task:
    prior = BoxUniform(low=jnp.array([-1.0, -1.0, -1.0]), high=jnp.array([1.0, 1.0, 1.0]))
    return Task("gaussian_bump_image", prior, _bump_sim, 3, 1024, x_image_shape=(32, 32))


# --------------------------------------------------------------------------
# Gaussian Mixture (2D θ) — sbibm formulation: x|θ is a two-scale mixture
# around θ; tractable likelihood → exact grid posterior (multimodality-free
# but heavy-tail/sharp-peak structure stresses the bar head's resolution).
# --------------------------------------------------------------------------


def _gaussian_mixture_sim(rng, theta, scale_wide=1.0, scale_narrow=0.1):
    k_c, k_n = jax.random.split(rng)
    narrow = jax.random.bernoulli(k_c, 0.5)
    scale = jnp.where(narrow, scale_narrow, scale_wide)
    return theta + scale * jax.random.normal(k_n, theta.shape)


def _gaussian_mixture_log_likelihood(theta, x, scale_wide=1.0, scale_narrow=0.1):
    """log p(x|θ) = log ½[N(x; θ, s_w²I) + N(x; θ, s_n²I)]. theta [..., 2]."""
    d2 = jnp.sum(jnp.square(x - theta), axis=-1)
    lw = -0.5 * d2 / scale_wide**2 - 2 * math.log(scale_wide)
    ln = -0.5 * d2 / scale_narrow**2 - 2 * math.log(scale_narrow)
    both = jnp.stack([lw, ln], axis=-1) - math.log(2 * math.pi) - math.log(2.0)
    return jax.scipy.special.logsumexp(both, axis=-1)


def _gaussian_mixture_posterior_sampler(rng, x_o, n, grid: int = 512):
    """Exact posterior via dense grid over the box prior (same scheme as the
    two-moons ground truth)."""
    g = (jnp.arange(grid) + 0.5) / grid * 20.0 - 10.0
    tt = jnp.stack(jnp.meshgrid(g, g, indexing="ij"), axis=-1).reshape(-1, 2)
    logp = _gaussian_mixture_log_likelihood(tt, x_o)
    k_cat, k_jit = jax.random.split(rng)
    idx = jax.random.categorical(k_cat, logp, shape=(n,))
    cell = 20.0 / grid
    jitter = (jax.random.uniform(k_jit, (n, 2)) - 0.5) * cell
    return tt[idx] + jitter


def gaussian_mixture() -> Task:
    prior = BoxUniform(low=-10.0 * jnp.ones(2), high=10.0 * jnp.ones(2))
    return Task(
        "gaussian_mixture", prior, _gaussian_mixture_sim, 2, 2,
        _gaussian_mixture_posterior_sampler,
    )


# --------------------------------------------------------------------------
# Bernoulli GLM (10D θ) — sbibm family: spike-train GLM with sufficient
# summary statistics x = Vᵀz, so p(θ|z) = p(θ|x) is tractable → MCMC
# reference posterior (same vectorized-MH scheme as SLCP).
# --------------------------------------------------------------------------

_GLM_T = 100  # time bins


def _glm_design(dim=10):
    """Fixed random design matrix [T, dim] (shared by simulator and
    likelihood; deterministic seed so the task is reproducible)."""
    v = jax.random.normal(jax.random.PRNGKey(1234), (_GLM_T, dim))
    return v / jnp.sqrt(dim)


def _bernoulli_glm_sim(rng, theta):
    v = _glm_design(theta.shape[-1])
    p = jax.nn.sigmoid(v @ theta)
    z = jax.random.bernoulli(rng, p).astype(jnp.float32)
    return v.T @ z  # sufficient statistic [dim]


def _bernoulli_glm_log_likelihood(theta, x_o):
    """log p(z|θ) as a function of the sufficient statistic x = Vᵀz:
    x·θ − Σ_t log(1 + exp(V_t·θ)). theta [..., dim]."""
    v = _glm_design(theta.shape[-1])
    eta = theta @ v.T  # [..., T]
    return jnp.sum(x_o * theta, axis=-1) - jnp.sum(jax.nn.softplus(eta), axis=-1)


def _bernoulli_glm_posterior_sampler(
    rng, x_o, n, num_chains: int = 256, num_steps: int = 4000, prior_scale=2.0
):
    dim = x_o.shape[-1]
    k_init, k_mh = jax.random.split(rng)
    pos = prior_scale * jax.random.normal(k_init, (num_chains, dim))

    def log_post(th):
        lp_prior = -0.5 * jnp.sum(jnp.square(th / prior_scale), axis=-1)
        return lp_prior + _bernoulli_glm_log_likelihood(th, x_o)

    logp = log_post(pos)
    step_scale = 0.15

    def mh_step(carry, key):
        pos, logp = carry
        k1, k2 = jax.random.split(key)
        prop = pos + step_scale * jax.random.normal(k1, pos.shape)
        logp_prop = log_post(prop)
        accept = jnp.log(jax.random.uniform(k2, (num_chains,))) < (logp_prop - logp)
        pos = jnp.where(accept[:, None], prop, pos)
        logp = jnp.where(accept, logp_prop, logp)
        return (pos, logp), pos

    keys = jax.random.split(k_mh, num_steps)
    _, chain = jax.lax.scan(mh_step, (pos, logp), keys)
    flat = chain[num_steps // 2 :].reshape(-1, dim)
    idx = jax.random.permutation(jax.random.fold_in(rng, 1), flat.shape[0])[:n]
    return flat[idx]


def bernoulli_glm(dim: int = 10) -> Task:
    prior = Normal(loc=jnp.zeros(dim), scale=2.0 * jnp.ones(dim))
    return Task(
        "bernoulli_glm", prior, _bernoulli_glm_sim, dim, dim,
        _bernoulli_glm_posterior_sampler,
    )


# --------------------------------------------------------------------------
# Gaussian Linear Uniform (sbibm): box prior, Gaussian likelihood — the
# exact posterior is a per-dimension truncated normal, sampled by inverse
# CDF. Complements gaussian_linear with a bounded-support analytic task
# (exercises the prior-support rejection path with a known ground truth).
# --------------------------------------------------------------------------


def gaussian_linear_uniform(dim: int = 10, noise_scale: float = 0.316227766) -> Task:
    prior = BoxUniform(low=-jnp.ones(dim), high=jnp.ones(dim))

    def sim(rng, theta):
        return theta + noise_scale * jax.random.normal(rng, theta.shape)

    def posterior_sampler(rng, x_o, n):
        # Per-dim truncated N(x_i, σ²) on [-1, 1]: inverse-CDF sampling.
        from jax.scipy.special import ndtri
        from jax.scipy.stats.norm import cdf as ncdf

        lo = ncdf((-1.0 - x_o) / noise_scale)
        hi = ncdf((1.0 - x_o) / noise_scale)
        u = jax.random.uniform(rng, (n, dim), minval=lo, maxval=hi)
        # Clamp away from {0,1} so ndtri stays finite for extreme x_o.
        u = jnp.clip(u, 1e-7, 1.0 - 1e-7)
        return jnp.clip(x_o + noise_scale * ndtri(u), -1.0, 1.0)

    def posterior_log_prob(x_o, theta):
        # Per-dim truncated N(x_i, σ²) on [-1, 1].
        from jax.scipy.stats.norm import cdf as ncdf

        z = (theta - x_o) / noise_scale
        log_norm = jnp.log(
            jnp.maximum(
                ncdf((1.0 - x_o) / noise_scale) - ncdf((-1.0 - x_o) / noise_scale),
                1e-300,
            )
        )
        per_dim = (
            -0.5 * z**2
            - jnp.log(noise_scale)
            - 0.5 * jnp.log(2 * jnp.pi)
            - log_norm
        )
        inside = jnp.all(jnp.abs(theta) <= 1.0, axis=-1)
        return jnp.where(inside, jnp.sum(per_dim, axis=-1), -jnp.inf)

    return Task(
        f"gaussian_linear_uniform_{dim}d", prior, sim, dim, dim, posterior_sampler,
        posterior_log_prob=posterior_log_prob,
    )


# --------------------------------------------------------------------------
# High-dim Gaussian — the reference's `high_dim_gaussian` eval task: a
# two-stage linear-Gaussian process θ → likelihood → noisy observation with
# an analytic MVN posterior (evaluate_ropefm.py:435-446 prior,
# :505-585 ground-truth posterior; parameters are fixed draws from a seeded
# generator, reproduced here with a fixed JAX PRNG key — same semantics,
# not bitwise-identical parameter values).
# --------------------------------------------------------------------------


def _hdg_params(
    theta_dim: int,
    obs_dim: int,
    prior_var_scale: float = 5.0,
    likelihood_var_scale: float = 2.0,
    noisy_var_scale: float = 5.0,
):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    prior_loc = jax.random.uniform(ks[0], (theta_dim,)) * 10.0 - 5.0
    s_theta = prior_var_scale * jax.random.normal(ks[1], (theta_dim, theta_dim))
    prior_cov = s_theta @ s_theta.T + jnp.eye(theta_dim)
    a_mat = jax.random.normal(ks[2], (obs_dim, theta_dim))
    b_vec = jax.random.normal(ks[3], (obs_dim,))
    s_lik = likelihood_var_scale * jax.random.normal(ks[4], (obs_dim, obs_dim))
    lik_cov = s_lik @ s_lik.T + 1e-3 * jnp.eye(obs_dim)
    c_mat = 1.0 + jax.random.normal(ks[5], (obs_dim, obs_dim))
    d_vec = jax.random.uniform(ks[6], (obs_dim,)) * 5.0 + 5.0
    s_noise = noisy_var_scale * jax.random.normal(ks[7], (obs_dim, obs_dim))
    noise_cov = s_noise @ s_noise.T + 1e-3 * jnp.eye(obs_dim)
    return prior_loc, prior_cov, a_mat, b_vec, lik_cov, c_mat, d_vec, noise_cov


def high_dim_gaussian(theta_dim: int = 3, obs_dim: int = 3) -> Task:
    (prior_loc, prior_cov, a_mat, b_vec, lik_cov, c_mat, d_vec,
     noise_cov) = _hdg_params(theta_dim, obs_dim)
    prior = MultivariateNormal(prior_loc, prior_cov)
    chol_lik = jnp.linalg.cholesky(lik_cov)
    chol_noise = jnp.linalg.cholesky(noise_cov)

    def sim(rng, theta):
        k1, k2 = jax.random.split(rng)
        x_lik = a_mat @ theta + b_vec + chol_lik @ jax.random.normal(k1, (obs_dim,))
        return c_mat @ x_lik + d_vec + chol_noise @ jax.random.normal(k2, (obs_dim,))

    # Collapse the two stages: y = Fθ + c + ε with ε ~ N(0, Σ_y), so the
    # posterior is the standard linear-Gaussian conjugate update
    # (evaluate_ropefm.py:544-585).
    f_mat = c_mat @ a_mat
    c_vec = c_mat @ b_vec + d_vec
    sigma_y = c_mat @ lik_cov @ c_mat.T + noise_cov
    sigma_y_inv = jnp.linalg.inv(sigma_y)
    prior_cov_inv = jnp.linalg.inv(prior_cov)
    post_cov = jnp.linalg.inv(prior_cov_inv + f_mat.T @ sigma_y_inv @ f_mat)
    post_chol = jnp.linalg.cholesky(
        0.5 * (post_cov + post_cov.T) + 1e-9 * jnp.eye(theta_dim)
    )

    def _post_mean(x_o):
        return post_cov @ (
            prior_cov_inv @ prior_loc + f_mat.T @ (sigma_y_inv @ (x_o - c_vec))
        )

    def posterior_sampler(rng, x_o, n):
        eps = jax.random.normal(rng, (n, theta_dim))
        return _post_mean(x_o) + eps @ post_chol.T

    def posterior_log_prob(x_o, theta):
        diff = theta - _post_mean(x_o)
        z = jax.scipy.linalg.solve_triangular(post_chol, diff.T, lower=True).T
        logdet = jnp.sum(jnp.log(jnp.diag(post_chol)))
        return (
            -0.5 * jnp.sum(z**2, axis=-1)
            - logdet
            - 0.5 * theta_dim * jnp.log(2 * jnp.pi)
        )

    return Task(
        "high_dim_gaussian", prior, sim, theta_dim, obs_dim, posterior_sampler,
        posterior_log_prob=posterior_log_prob,
    )


_TASKS = {
    "two_moons": two_moons,
    "gaussian_linear": gaussian_linear,
    "slcp": slcp,
    "lotka_volterra": lotka_volterra,
    "sir": sir,
    "pendulum": pendulum,
    "gaussian_bump_image": gaussian_bump_image,
    "gaussian_mixture": gaussian_mixture,
    "bernoulli_glm": bernoulli_glm,
    "high_dim_gaussian": high_dim_gaussian,
    "gaussian_linear_uniform": gaussian_linear_uniform,
    "wind_tunnel": wind_tunnel,
}


def list_tasks():
    return sorted(_TASKS)


def get_task(name: str, **kwargs) -> Task:
    if name not in _TASKS:
        raise ValueError(f"unknown task {name!r}; available: {list_tasks()}")
    return _TASKS[name](**kwargs)
