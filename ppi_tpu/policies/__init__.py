"""Policy/prior library: Gaussian, feature, kernel, and noise families.

Name-based registry mirroring the reference's CLI resolution UX
(reference: run_mpc.py:33-35, 134-136): ``make_policy("SquaredExponentialKernel",
...)`` accepts the union of all hyperparameters and each family takes what it
needs — but through an explicit factory rather than ``getattr`` + kwargs-soup.
"""

from typing import Optional

import jax.numpy as jnp

from ppi_tpu.policies.design import clip_actions, design_moments, unbounded_like
from ppi_tpu.policies.gaussian import Gaussian, GaussianState
from ppi_tpu.policies.features import BaseFeatures, RbfFeatures, RffFeatures
from ppi_tpu.policies.kernels import (
    BaseKernel,
    KernelState,
    LgdsKernelPolicy,
    WhiteNoiseKernelPolicy,
    KERNELS,
)
from ppi_tpu.policies.noise import (
    ColouredNoise,
    NoiseState,
    SmoothActionNoise,
    SmoothExplorationNoise,
    WhiteNoiseIid,
)
from ppi_tpu.samplers import BY_NAME as SAMPLERS_BY_NAME
from ppi_tpu.samplers import SamplerKind

__all__ = [
    "RbfFeatures",
    "RffFeatures",
    "SquaredExponentialKernel",
    "WhiteNoiseKernel",
    "WhiteNoiseIid",
    "ColouredNoise",
    "SmoothActionNoise",
    "SmoothExplorationNoise",
    "Matern12Kernel",
    "Matern32Kernel",
    "Matern52Kernel",
    "PeriodicKernel",
    "LinearGaussianDynamicalSystemKernel",
    "Gaussian",
    "make_policy",
    "design_moments",
]

POLICY_NAMES = [
    "RbfFeatures", "RffFeatures", "SquaredExponentialKernel",
    "WhiteNoiseKernel", "WhiteNoiseIid", "ColouredNoise", "SmoothActionNoise",
    "SmoothExplorationNoise", "Matern12Kernel", "Matern32Kernel",
    "Matern52Kernel", "PeriodicKernel", "LinearGaussianDynamicalSystemKernel",
]


def make_policy(
    name: str,
    time_sequence,
    action_dimension: int,
    mean,
    covariance_in,
    covariance_out,
    lengthscale: float = 1.0,
    period: float = 1.0,
    n_features: int = 10,
    order: int = 10,
    sampler="MonteCarlo",
    beta: float = 2.0,
    use_derivatives: bool = False,
    add_bias: bool = False,
    lower=None,
    upper=None,
    max_particles: int = 1,
    lgds_order: int = 2,
    track_entropy: bool = False,
):
    """Build (family, state) for a policy family by reference-compatible name."""
    sampler_kind = (sampler if isinstance(sampler, SamplerKind)
                    else SAMPLERS_BY_NAME[sampler])
    t = jnp.asarray(time_sequence)
    horizon = int(t.shape[0])
    common = dict(horizon=horizon, action_dim=int(action_dimension),
                  sampler=sampler_kind, use_derivatives=use_derivatives,
                  max_particles=max_particles)
    mean = jnp.asarray(mean)
    covariance_in = jnp.asarray(covariance_in)
    covariance_out = jnp.asarray(covariance_out)

    if name == "RbfFeatures":
        fam = RbfFeatures(n_features=n_features, lengthscale=lengthscale,
                          add_bias=add_bias, track_entropy=track_entropy,
                          t_min=float(t[0]), t_max=float(t[-1]), **common)
        return fam, fam.init(t, mean, covariance_in, covariance_out, lower, upper)
    if name == "RffFeatures":
        fam = RffFeatures(order=order, lengthscale=lengthscale,
                          add_bias=add_bias, track_entropy=track_entropy,
                          **common)
        return fam, fam.init(t, mean, covariance_in, covariance_out, lower, upper)
    if name in KERNELS or name == "LinearGaussianDynamicalSystemKernel":
        if name == "WhiteNoiseKernel":
            fam = WhiteNoiseKernelPolicy(track_entropy=track_entropy, **common)
        elif name == "LinearGaussianDynamicalSystemKernel":
            fam = LgdsKernelPolicy(lgds_order=lgds_order,
                                   track_entropy=track_entropy, **common)
        else:
            fam = BaseKernel(kernel=name, track_entropy=track_entropy, **common)
        return fam, fam.init(t, mean, covariance_in, covariance_out,
                             lengthscale=lengthscale, period=period,
                             lower=lower, upper=upper)
    noise_families = {
        "WhiteNoiseIid": WhiteNoiseIid,
        "ColouredNoise": ColouredNoise,
        "SmoothExplorationNoise": SmoothExplorationNoise,
        "SmoothActionNoise": SmoothActionNoise,
    }
    if name in noise_families:
        cls = noise_families[name]
        kwargs = dict(common)
        if name != "WhiteNoiseIid":
            kwargs["beta"] = beta
        fam = cls(**kwargs)
        return fam, fam.init(t, mean, covariance_in, covariance_out, lower, upper)
    raise ValueError(f"Unknown policy family: {name!r}; "
                     f"expected one of {POLICY_NAMES}")
