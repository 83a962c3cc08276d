"""Small numeric kernels shared by the exposure engine."""

from __future__ import annotations

import jax.numpy as jnp


def binomial_at_least_one(p, n):
    """P(at least one success in n independent trials) = 1 - (1-p)^n.

    Mirrors the reference's ``binomial`` (sim/src/models/citizen.rs:47-49).
    Computed as ``-expm1(n * log1p(-p))`` which is accurate for the tiny
    per-contact probabilities involved (p ~ 5.5e-4).
    """
    p = jnp.asarray(p, jnp.float32)
    n = jnp.asarray(n, jnp.float32)
    return -jnp.expm1(n * jnp.log1p(-p))


def truncate_u8(n):
    """Replicate the reference's ``exposure_total as u8`` cast.

    ``Citizen::expose`` receives ``exposure_total: usize`` and narrows it with
    ``as u8`` (citizen.rs:239), which in Rust truncates modulo 256.  Buildings
    with more than 255 infected occupants therefore wrap around — a
    bug-as-behaviour we reproduce for fidelity (gated by
    ``SimConfig.reference_u8_truncation``).
    """
    return jnp.asarray(n, jnp.int32) & 0xFF
