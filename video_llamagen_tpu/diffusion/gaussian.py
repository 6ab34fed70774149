"""Gaussian diffusion (IDDPM) — JAX rebuild of the reference diffusion core.

Capability parity with reference diffusion/ (gaussian_diffusion.py, respace.py,
diffusion_utils.py, __init__.py): epsilon-prediction with LEARNED_RANGE
variance, cosine/linear schedules, hybrid MSE+VLB training loss, DDPM ancestral
sampling with timestep respacing ("100"-style) and MAR's temperature-scaled
noise (gaussian_diffusion.py:418-419).

TPU-first: all schedule tables are static numpy arrays baked into the jitted
program; the ancestral sampling loop is a `lax.scan` over the (static) respaced
timestep ladder so the full DiffLoss sample runs in one compiled call (no
per-step Python, ref gaussian_diffusion.py:422-470 loops in Python).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp


def linear_beta_schedule(num_steps: int, scale_ref_steps: int = 1000) -> np.ndarray:
    scale = scale_ref_steps / num_steps
    return np.linspace(scale * 1e-4, scale * 2e-2, num_steps, dtype=np.float64)


def cosine_beta_schedule(num_steps: int, max_beta: float = 0.999) -> np.ndarray:
    """squaredcos_cap_v2 (ref gaussian_diffusion.py get_named_beta_schedule)."""
    def acb(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_steps):
        betas.append(min(1 - acb((i + 1) / num_steps) / acb(i / num_steps), max_beta))
    return np.asarray(betas, dtype=np.float64)


def get_named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    if name == "linear":
        return linear_beta_schedule(num_steps)
    if name in ("cosine", "squaredcos_cap_v2"):
        return cosine_beta_schedule(num_steps)
    raise ValueError(f"unknown beta schedule {name}")


def space_timesteps(num_timesteps: int, section_counts: Union[str, Sequence[int]]) -> List[int]:
    """Subset of original timesteps for respaced sampling (ref respace.py)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[4:])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return list(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired} ddim steps")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps: List[int] = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        taken = []
        for _ in range(count):
            taken.append(start_idx + round(cur))
            cur += stride
        all_steps += taken
        start_idx += size
    return sorted(set(all_steps))


def _extract(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and broadcast to x's rank."""
    out = arr[t].astype(jnp.float32)
    return out.reshape(t.shape[0], *([1] * (ndim - 1)))


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """Log-likelihood of a discretized (1/255-bin) Gaussian (ref diffusion_utils.py)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, a_min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, a_min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, a_min=1e-12))))


@dataclass(frozen=True)
class GaussianDiffusion:
    """Schedule tables + pure sampling/loss functions.

    Build via `create_diffusion`. `timestep_map` maps respaced index -> original
    timestep fed to the model (ref respace.py _WrappedModel).
    """

    betas: np.ndarray
    timestep_map: np.ndarray  # (num_timesteps,) int32

    # derived tables (filled in __post_init__)
    alphas_cumprod: np.ndarray = field(init=False)
    alphas_cumprod_prev: np.ndarray = field(init=False)
    sqrt_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_one_minus_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_recip_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_recipm1_alphas_cumprod: np.ndarray = field(init=False)
    posterior_variance: np.ndarray = field(init=False)
    posterior_log_variance_clipped: np.ndarray = field(init=False)
    posterior_mean_coef1: np.ndarray = field(init=False)
    posterior_mean_coef2: np.ndarray = field(init=False)

    def __post_init__(self):
        betas = np.asarray(self.betas, dtype=np.float64)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        object.__setattr__(self, "alphas_cumprod", acp)
        object.__setattr__(self, "alphas_cumprod_prev", acp_prev)
        object.__setattr__(self, "sqrt_alphas_cumprod", np.sqrt(acp))
        object.__setattr__(self, "sqrt_one_minus_alphas_cumprod", np.sqrt(1.0 - acp))
        object.__setattr__(self, "sqrt_recip_alphas_cumprod", np.sqrt(1.0 / acp))
        object.__setattr__(self, "sqrt_recipm1_alphas_cumprod", np.sqrt(1.0 / acp - 1))
        object.__setattr__(self, "posterior_variance", post_var)
        object.__setattr__(self, "posterior_log_variance_clipped",
                           np.log(np.append(post_var[1], post_var[1:])))
        object.__setattr__(self, "posterior_mean_coef1",
                           betas * np.sqrt(acp_prev) / (1.0 - acp))
        object.__setattr__(self, "posterior_mean_coef2",
                           (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp))

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    # ------------------------------------------------------------------ q(x_t)
    def q_sample(self, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray):
        return (_extract(jnp.asarray(self.sqrt_alphas_cumprod), t, x0.ndim) * x0
                + _extract(jnp.asarray(self.sqrt_one_minus_alphas_cumprod), t,
                           x0.ndim) * noise)

    def q_posterior_mean_variance(self, x0, x_t, t):
        mean = (_extract(jnp.asarray(self.posterior_mean_coef1), t, x_t.ndim) * x0
                + _extract(jnp.asarray(self.posterior_mean_coef2), t, x_t.ndim) * x_t)
        var = _extract(jnp.asarray(self.posterior_variance), t, x_t.ndim)
        logvar = _extract(jnp.asarray(self.posterior_log_variance_clipped), t, x_t.ndim)
        return mean, var, logvar

    def predict_xstart_from_eps(self, x_t, t, eps):
        return (_extract(jnp.asarray(self.sqrt_recip_alphas_cumprod), t, x_t.ndim) * x_t
                - _extract(jnp.asarray(self.sqrt_recipm1_alphas_cumprod), t,
                           x_t.ndim) * eps)

    # --------------------------------------------------------------- p(x_{t-1})
    def p_mean_variance(self, model_out: jnp.ndarray, x: jnp.ndarray,
                        t: jnp.ndarray, clip_denoised: bool = False,
                        x0_clip: Optional[float] = None):
        """LEARNED_RANGE: model_out is [eps, var_interp] along channels
        (ref gaussian_diffusion.py:246-289).

        `x0_clip`: clamp the x0 estimate to [-x0_clip, x0_clip]. For
        non-image targets (VAE latents) the reference's clip_denoised=False
        is numerically unstable on the respaced cosine ladder: at the last
        original timestep sqrt(1/acp-1) ~ 2e4 (capped betas), so an eps error
        of 0.03 becomes a 600-sigma x0 estimate, and the respaced first
        step's posterior coef1 (~0.017 at "100") injects ~10 sigma of it
        into the chain, which then diverges monotonically (measured: sampled
        latent std 2919 vs target 1.56). A generous latent-space bound caps
        the injection (0.017*bound) without biasing in-range estimates."""
        c = x.shape[-1]
        eps, var_frac = jnp.split(model_out, [c], axis=-1)
        min_log = _extract(jnp.asarray(self.posterior_log_variance_clipped), t, x.ndim)
        max_log = _extract(jnp.asarray(np.log(self.betas)), t, x.ndim)
        frac = (var_frac + 1.0) / 2.0
        model_log_var = frac * max_log + (1 - frac) * min_log

        x0 = self.predict_xstart_from_eps(x, t, eps)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        elif x0_clip is not None:
            x0 = jnp.clip(x0, -x0_clip, x0_clip)
        mean, _, _ = self.q_posterior_mean_variance(x0, x, t)
        return mean, model_log_var, x0

    def vb_terms_bpd(self, model_out, x0, x_t, t, clip_denoised=False):
        true_mean, _, true_logvar = self.q_posterior_mean_variance(x0, x_t, t)
        mean, logvar, pred_x0 = self.p_mean_variance(model_out, x_t, t, clip_denoised)
        kl = mean_flat(normal_kl(true_mean, true_logvar, mean, logvar)) / np.log(2.0)
        decoder_nll = mean_flat(
            -discretized_gaussian_log_likelihood(x0, mean, 0.5 * logvar)) / np.log(2.0)
        return jnp.where(t == 0, decoder_nll, kl)

    # ------------------------------------------------------------------- losses
    def training_losses(self, model_fn: Callable, x0: jnp.ndarray,
                        t: jnp.ndarray, rng: jax.Array):
        """Hybrid loss: MSE on eps + VLB on (stop-grad mean, learned var)
        (ref gaussian_diffusion.py:719-773, MSE branch with LEARNED_RANGE).

        model_fn(x_t, t_orig) -> (N, 2C). Returns per-sample loss (N,).
        """
        noise = jax.random.normal(rng, x0.shape, x0.dtype)
        x_t = self.q_sample(x0, t, noise)
        t_orig = jnp.asarray(self.timestep_map)[t]
        model_out = model_fn(x_t, t_orig)
        c = x0.shape[-1]
        eps, var_frac = jnp.split(model_out, [c], axis=-1)
        # vb term trains ONLY the variance: freeze the mean input
        frozen = jnp.concatenate([jax.lax.stop_gradient(eps), var_frac], axis=-1)
        vb = self.vb_terms_bpd(frozen, x0, x_t, t)
        mse = mean_flat((noise - eps) ** 2)
        return mse + vb

    # ----------------------------------------------------------------- sampling
    def p_sample_loop(self, model_fn: Callable, noise: jnp.ndarray,
                      rng: jax.Array, temperature: float = 1.0,
                      clip_denoised: bool = False,
                      x0_clip: Optional[float] = None) -> jnp.ndarray:
        """Ancestral sampling as one lax.scan over the respaced ladder.

        model_fn(x, t_orig) -> (N, 2C) with t_orig already mapped.
        `x0_clip`: see p_mean_variance — stabilizes latent-space sampling.
        """
        n_steps = self.num_timesteps
        tmap = jnp.asarray(self.timestep_map)

        def step(carry, i):
            x, rng = carry
            t_idx = n_steps - 1 - i
            t = jnp.full((x.shape[0],), t_idx, jnp.int32)
            model_out = model_fn(x, tmap[t])
            mean, logvar, _ = self.p_mean_variance(model_out, x, t, clip_denoised,
                                                   x0_clip)
            rng, r = jax.random.split(rng)
            z = jax.random.normal(r, x.shape, x.dtype)
            nonzero = (t_idx != 0)
            x = mean + nonzero * jnp.exp(0.5 * logvar) * z * temperature
            return (x, rng), None

        (x, _), _ = jax.lax.scan(step, (noise, rng), jnp.arange(n_steps))
        return x


    def ddim_sample_loop(self, model_fn: Callable, noise: jnp.ndarray,
                         rng: jax.Array, eta: float = 0.0,
                         clip_denoised: bool = False) -> jnp.ndarray:
        """DDIM sampling over the respaced ladder (ref gaussian_diffusion.py
        ddim_sample/ddim_sample_loop), eta=0 deterministic."""
        n_steps = self.num_timesteps
        tmap = jnp.asarray(self.timestep_map)
        acp = jnp.asarray(self.alphas_cumprod)
        acp_prev = jnp.asarray(self.alphas_cumprod_prev)

        def step(carry, i):
            x, rng = carry
            t_idx = n_steps - 1 - i
            t = jnp.full((x.shape[0],), t_idx, jnp.int32)
            model_out = model_fn(x, tmap[t])
            c = x.shape[-1]
            eps, _ = jnp.split(model_out, [c], axis=-1)
            x0 = self.predict_xstart_from_eps(x, t, eps)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            # re-derive eps from (possibly clipped) x0
            eps = ((_extract(jnp.asarray(self.sqrt_recip_alphas_cumprod), t,
                             x.ndim) * x - x0)
                   / _extract(jnp.asarray(self.sqrt_recipm1_alphas_cumprod), t,
                              x.ndim))
            a_bar = _extract(acp, t, x.ndim)
            a_bar_prev = _extract(acp_prev, t, x.ndim)
            sigma = (eta * jnp.sqrt((1 - a_bar_prev) / (1 - a_bar))
                     * jnp.sqrt(1 - a_bar / a_bar_prev))
            rng, r = jax.random.split(rng)
            z = jax.random.normal(r, x.shape, x.dtype)
            mean = (jnp.sqrt(a_bar_prev) * x0
                    + jnp.sqrt(jnp.maximum(1 - a_bar_prev - sigma ** 2, 0.0))
                    * eps)
            nonzero = (t_idx != 0)
            x = mean + nonzero * sigma * z
            return (x, rng), None

        (x, _), _ = jax.lax.scan(step, (noise, rng), jnp.arange(n_steps))
        return x


def create_diffusion(timestep_respacing: Union[str, Sequence[int], None] = "",
                     noise_schedule: str = "linear",
                     diffusion_steps: int = 1000) -> GaussianDiffusion:
    """Factory matching reference diffusion/__init__.py:12-50 defaults
    (epsilon prediction, learn_sigma=True, hybrid MSE loss)."""
    betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    if timestep_respacing is None or timestep_respacing == "":
        timestep_respacing = [diffusion_steps]
    use_ts = space_timesteps(diffusion_steps, timestep_respacing)

    # rescale betas onto the respaced ladder (ref respace.py:60-74)
    acp = np.cumprod(1.0 - betas)
    last = 1.0
    new_betas, tmap = [], []
    for i in sorted(use_ts):
        new_betas.append(1.0 - acp[i] / last)
        last = acp[i]
        tmap.append(i)
    return GaussianDiffusion(betas=np.asarray(new_betas),
                             timestep_map=np.asarray(tmap, np.int32))
