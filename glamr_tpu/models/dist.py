"""Reparameterized diagonal Normal for the CVAEs.

Pytree-registered so distributions flow through jit/scan unmodified.
Reference behaviour: lib/utils/dist.py:8-51 (same closed-form KL).
Sampling takes explicit PRNG keys — the JAX replacement for the
reference's global-seed discipline (SURVEY §5.2).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Normal:
    mu: jax.Array
    logvar: jax.Array

    @classmethod
    def from_params(cls, params: jax.Array) -> "Normal":
        mu, logvar = jnp.split(params, 2, axis=-1)
        return cls(mu=mu, logvar=logvar)

    @property
    def sigma(self) -> jax.Array:
        return jnp.exp(0.5 * self.logvar)

    def sample(self, key_or_eps) -> jax.Array:
        """Reparameterized sample. Accepts a PRNGKey or a fixed eps array
        (the latent-injection path used by stage-4 latent optimization,
        reference dist.py:21-26 with eps!=None)."""
        if isinstance(key_or_eps, jax.Array) and key_or_eps.dtype == jnp.uint32:
            eps = jax.random.normal(key_or_eps, self.mu.shape, self.mu.dtype)
        else:
            eps = key_or_eps
        return self.mu + eps * self.sigma

    rsample = sample

    def kl(self, p: "Normal | None" = None) -> jax.Array:
        """KL(self || p); standard normal prior when p is None."""
        if p is None:
            return -0.5 * (1.0 + self.logvar - self.mu**2 - jnp.exp(self.logvar))
        term1 = (self.mu - p.mu) / (p.sigma + 1e-8)
        term2 = self.sigma / (p.sigma + 1e-8)
        return 0.5 * (term1**2 + term2**2) - 0.5 - jnp.log(term2)

    def mode(self) -> jax.Array:
        return self.mu


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Categorical:
    """Categorical over logits (reference lib/utils/dist.py:54-85 — unused
    by the shipped models but part of the distribution surface)."""

    logits: jax.Array

    @property
    def probs(self) -> jax.Array:
        return jax.nn.softmax(self.logits, axis=-1)

    def sample(self, key) -> jax.Array:
        return jax.random.categorical(key, self.logits, axis=-1)

    def kl(self, p: "Categorical") -> jax.Array:
        lq = jax.nn.log_softmax(self.logits, axis=-1)
        lp = jax.nn.log_softmax(p.logits, axis=-1)
        return (jnp.exp(lq) * (lq - lp)).sum(-1)

    def mode(self) -> jax.Array:
        return jnp.argmax(self.logits, axis=-1)
