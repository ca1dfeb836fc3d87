"""Variance-preserving DDPM noise schedules and transition algebra.

Reproduces the math of the reference's predefined schedules and
p(z_s | z_t) coefficients (reference: models/ligand_diffuser.py:232-252
and :600-690, which in turn follow DiffSBDD / EDM conventions), as pure
functions over a precomputed gamma table. Everything here is host-side
numpy at construction time and tiny jnp gathers at trace time, so it
fuses away under jit.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = [
    "cosine_beta_schedule",
    "clip_noise_schedule",
    "polynomial_schedule",
    "NoiseSchedule",
    "sigma_from_gamma",
    "alpha_from_gamma",
    "sigma_and_alpha_t_given_s",
]


def cosine_beta_schedule(timesteps: int, s: float = 0.008, raise_to_power: float = 1.0) -> np.ndarray:
    """Cosine alpha-bar schedule (Nichol & Dhariwal). Returns alphas_cumprod.

    Matches reference models/ligand_diffuser.py:600-617.
    """
    steps = timesteps + 2
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    betas = np.clip(betas, a_min=0, a_max=0.999)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    if raise_to_power != 1:
        alphas_cumprod = np.power(alphas_cumprod, raise_to_power)
    return alphas_cumprod


def clip_noise_schedule(alphas2: np.ndarray, clip_value: float = 0.001) -> np.ndarray:
    """Clip per-step alpha^2 ratios for sampling stability.

    Matches reference models/ligand_diffuser.py:620-633.
    """
    alphas2 = np.concatenate([np.ones(1), alphas2], axis=0)
    alphas_step = alphas2[1:] / alphas2[:-1]
    alphas_step = np.clip(alphas_step, a_min=clip_value, a_max=1.0)
    return np.cumprod(alphas_step, axis=0)


def polynomial_schedule(timesteps: int, s: float = 1e-4, power: float = 3.0) -> np.ndarray:
    """alpha^2(t) = ((1 - (t/T)^power)^2, ratio-clipped, squeezed to [s, 1-s].

    Matches reference models/ligand_diffuser.py:636-650.
    """
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas2 = (1 - np.power(x / steps, power)) ** 2
    alphas2 = clip_noise_schedule(alphas2, clip_value=0.001)
    precision = 1 - 2 * s
    alphas2 = precision * alphas2 + s
    return alphas2


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Lookup table gamma(t) = -log(alpha^2/sigma^2) for t on a (T+1)-point grid.

    The reference stores this as a frozen nn.Parameter
    (models/ligand_diffuser.py:654-690); here it is a plain array baked
    into the jaxpr as a constant.
    """

    timesteps: int
    gamma_table: np.ndarray  # (timesteps + 1,)

    @staticmethod
    def create(noise_schedule: str = "polynomial_2", timesteps: int = 1000, precision: float = 1e-4) -> "NoiseSchedule":
        if noise_schedule == "cosine":
            alphas2 = cosine_beta_schedule(timesteps)
        elif noise_schedule.startswith("polynomial"):
            splits = noise_schedule.split("_")
            if len(splits) != 2:
                raise ValueError(f"bad polynomial schedule name: {noise_schedule}")
            power = float(splits[1])
            alphas2 = polynomial_schedule(timesteps, s=precision, power=power)
        else:
            raise ValueError(f"unknown noise schedule: {noise_schedule}")
        sigmas2 = 1 - alphas2
        gamma = -(np.log(alphas2) - np.log(sigmas2))
        return NoiseSchedule(timesteps=timesteps, gamma_table=gamma.astype(np.float32))

    def gamma(self, t: jnp.ndarray) -> jnp.ndarray:
        """gamma at continuous t in [0, 1]; indexes the table at round(t*T)."""
        t_int = jnp.round(t * self.timesteps).astype(jnp.int32)
        return jnp.asarray(self.gamma_table)[t_int]


def sigma_from_gamma(gamma: jnp.ndarray) -> jnp.ndarray:
    """sigma(gamma) = sqrt(sigmoid(gamma)). Reference ligand_diffuser.py:232-234."""
    return jnp.sqrt(jax_sigmoid(gamma))


def alpha_from_gamma(gamma: jnp.ndarray) -> jnp.ndarray:
    """alpha(gamma) = sqrt(sigmoid(-gamma)). Reference ligand_diffuser.py:236-238."""
    return jnp.sqrt(jax_sigmoid(-gamma))


def jax_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / (1.0 + jnp.exp(-x))


def _softplus(x: jnp.ndarray) -> jnp.ndarray:
    # numerically stable log(1 + e^x)
    return jnp.logaddexp(x, 0.0)


def _log_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return -_softplus(-x)


def sigma_and_alpha_t_given_s(gamma_t: jnp.ndarray, gamma_s: jnp.ndarray):
    """Transition coefficients of q(z_t | z_s) for s < t.

    Returns (sigma^2_{t|s}, sigma_{t|s}, alpha_{t|s}); matches reference
    ligand_diffuser.py:240-252 (DiffSBDD algebra).
    """
    sigma2_t_given_s = -jnp.expm1(_softplus(gamma_s) - _softplus(gamma_t))
    log_alpha2_t = _log_sigmoid(-gamma_t)
    log_alpha2_s = _log_sigmoid(-gamma_s)
    alpha_t_given_s = jnp.exp(0.5 * (log_alpha2_t - log_alpha2_s))
    sigma_t_given_s = jnp.sqrt(sigma2_t_given_s)
    return sigma2_t_given_s, sigma_t_given_s, alpha_t_given_s
