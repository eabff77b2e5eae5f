"""Galaxy initial conditions (JAX PRNG).

Re-design of the reference IC module (reference: galaxy.py:10-211) on
``jax.random``: explicit keys instead of global torch RNG state, so ICs are
reproducible per-key and identical across backends. Bit-exact parity with
torch RNG is impossible; parity is validated statistically (profiles,
rotation curves) in the tests.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

Arrays = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]


@functools.partial(jax.jit, static_argnames=("num_stars", "galaxy_radius", "core_mass_fraction", "G"))
def create_disk_galaxy(key, num_stars: int = 5000, galaxy_radius: float = 10.0,
                       core_mass_fraction: float = 0.3,
                       G: float = 0.001) -> Arrays:
    """Exponential-disk galaxy with bulge-dominated inner region and
    near-circular orbits (reference: galaxy.py:10-92).

    Radii via inverse-CDF sampling of P(r) ~ exp(-r/scale) truncated at
    2*galaxy_radius; tangential velocities from an analytic bulge+disk
    enclosed-mass model; 10% isotropic velocity dispersion.
    """
    k_r, k_a, k_v = jax.random.split(key, 3)
    scale = galaxy_radius / 3.0
    max_r = galaxy_radius * 2.0

    u = jax.random.uniform(k_r, (num_stars,))
    radii = -scale * jnp.log(1.0 - u * (1.0 - math.exp(-max_r / scale)))
    radii = jnp.clip(radii, 0.1, max_r)
    angles = jax.random.uniform(k_a, (num_stars,)) * 2.0 * math.pi

    positions = jnp.stack([radii * jnp.cos(angles),
                           radii * jnp.sin(angles)], axis=-1)
    masses = jnp.ones((num_stars,), jnp.float32)
    total_mass = float(num_stars)

    # Enclosed mass: quadratic bulge inside core_radius, exponential-disk
    # cumulative profile outside (reference: galaxy.py:61-76).
    core_radius = galaxy_radius * 0.2
    bulge = core_mass_fraction * total_mass * (radii / core_radius) ** 2
    disk = ((1.0 - core_mass_fraction) * total_mass
            * (1.0 - (1.0 + radii / scale) * jnp.exp(-radii / scale))
            / (1.0 - 2.0 * math.exp(-max_r / scale)))
    enclosed = jnp.where(radii < core_radius, bulge,
                         core_mass_fraction * total_mass + disk)

    v_circ = jnp.sqrt(G * enclosed / jnp.maximum(radii, 0.1))
    dispersion = 0.1 * jnp.mean(v_circ)
    velocities = jnp.stack([-v_circ * jnp.sin(angles),
                            v_circ * jnp.cos(angles)], axis=-1)
    velocities = velocities + jax.random.normal(k_v, velocities.shape) * dispersion
    return positions.astype(jnp.float32), velocities.astype(jnp.float32), masses


@functools.partial(jax.jit, static_argnames=("num_stars", "G"))
def create_test_galaxy(key, num_stars: int = 1000,
                       G: float = 0.001) -> Arrays:
    """Uniform disk with Keplerian velocities, for quick experiments
    (reference: galaxy.py:95-124)."""
    k_r, k_a = jax.random.split(key)
    radii = jnp.sqrt(jax.random.uniform(k_r, (num_stars,))) * 10.0 + 0.5
    angles = jax.random.uniform(k_a, (num_stars,)) * 2.0 * math.pi
    positions = jnp.stack([radii * jnp.cos(angles),
                           radii * jnp.sin(angles)], axis=-1)
    masses = jnp.ones((num_stars,), jnp.float32)
    v_circ = jnp.sqrt(G * num_stars * 0.5 / radii)
    velocities = jnp.stack([-v_circ * jnp.sin(angles),
                            v_circ * jnp.cos(angles)], axis=-1)
    return positions.astype(jnp.float32), velocities.astype(jnp.float32), masses


def nfw_enclosed_mass(r: jnp.ndarray, M_total: float, r_s: float) -> jnp.ndarray:
    """Analytic NFW M(<r) = M_total * f(r/r_s) / f(10), with
    f(x) = ln(1+x) - x/(1+x) (reference: galaxy.py:127-139)."""
    x = r / r_s
    f_x = jnp.log1p(x) - x / (1.0 + x)
    f_norm = math.log(11.0) - 10.0 / 11.0
    return M_total * f_x / f_norm


@functools.partial(jax.jit, static_argnames=("num_stars", "galaxy_radius", "halo_radius", "dm_mass_ratio", "G"))
def create_galaxy_with_halo(key, num_stars: int = 5000,
                            galaxy_radius: float = 10.0,
                            halo_radius: float = 30.0,
                            dm_mass_ratio: float = 5.0,
                            G: float = 0.001) -> Arrays:
    """Disk galaxy embedded in an analytic NFW dark-matter halo: flat
    rotation-curve ICs (reference: galaxy.py:142-211). The halo contributes
    to the circular velocities but adds no particles."""
    k_disk, k_v = jax.random.split(key)
    pos, _, masses = create_disk_galaxy(k_disk, num_stars, galaxy_radius, G=G)

    visible_mass = jnp.sum(masses)
    dm_total = visible_mass * dm_mass_ratio

    r = jnp.sqrt(jnp.sum(pos * pos, axis=-1))
    theta = jnp.arctan2(pos[:, 1], pos[:, 0])

    # Enclosed visible mass via sort + cumsum (reference: galaxy.py:186-192).
    order = jnp.argsort(r)
    cum = jnp.cumsum(masses[order])
    enclosed_visible = jnp.zeros_like(masses).at[order].set(cum)
    enclosed_dm = nfw_enclosed_mass(r, dm_total, halo_radius)

    v_circ = jnp.sqrt(G * (enclosed_visible + enclosed_dm)
                      / jnp.maximum(r, 0.1))
    vel = jnp.stack([-v_circ * jnp.sin(theta), v_circ * jnp.cos(theta)],
                    axis=-1)
    dispersion = 0.05 * jnp.mean(v_circ)
    vel = vel + jax.random.normal(k_v, vel.shape) * dispersion
    return pos, vel.astype(jnp.float32), masses
