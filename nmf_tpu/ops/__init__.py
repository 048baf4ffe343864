"""Compute ops: MU updates, divergences, elementwise primitives, Pallas kernels."""

from .elementwise import EPS, element_divide, element_multiply, eps_clamp
from .divergence import beta_divergence, euclidean_cost, itakura_saito, kl_divergence
from .mu import matmul, mu_step, mu_step_beta, update_h, update_w

__all__ = [
    "EPS",
    "eps_clamp",
    "element_divide",
    "element_multiply",
    "kl_divergence",
    "euclidean_cost",
    "itakura_saito",
    "beta_divergence",
    "matmul",
    "mu_step",
    "mu_step_beta",
    "update_h",
    "update_w",
]
