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


@functools.partial(jax.jit, static_argnames=("num_stars", "scale_radius",
                                              "G"))
def create_plummer_sphere(key, num_stars: int = 5000,
                          scale_radius: float = 10.0,
                          G: float = 0.001) -> Arrays:
    """3-D Plummer sphere with isotropic Gaussian velocities.

    The flagship 3-D IC (the reference's 3-D engine seeds a uniform
    box + Hubble flow, universe_3d.py:1182-1234; for direct-kernel 3-D
    benchmarks a self-gravitating equilibrium model exercises the same
    kernels with bounded dynamics). Radii are drawn by inverse-CDF
    sampling of the Plummer cumulative mass profile
    M(<r)/M = (r/a)^3 / (1 + (r/a)^2)^{3/2}, truncated at 10a;
    directions are uniform on S^2; velocities are isotropic Gaussians
    with the local Plummer dispersion sigma^2(r) = G M / (6 sqrt(r^2 +
    a^2)) — the standard jit-friendly approximation of the exact
    distribution function (no rejection loop, so the whole IC is one
    traced program like the 2-D generators above). Masses are all 1.0
    (keeps the equal-mass kernel fast path applicable)."""
    k_r, k_dir, k_v = jax.random.split(key, 3)
    a = scale_radius
    total_mass = float(num_stars)

    # Inverse CDF: u = x^3/(1+x^2)^{3/2}  =>  x = u^{1/3}/sqrt(1-u^{2/3}),
    # with u capped so r <= 10a (u_max = CDF(10a)).
    u_max = 1000.0 / (1.0 + 100.0) ** 1.5
    u = jax.random.uniform(k_r, (num_stars,), minval=1e-6, maxval=u_max)
    u23 = u ** (2.0 / 3.0)
    radii = a * jnp.sqrt(u23 / (1.0 - u23))
    radii = jnp.clip(radii, 0.05 * a, 10.0 * a)

    # Uniform directions on S^2: z ~ U(-1,1), phi ~ U(0, 2pi).
    z = jax.random.uniform(k_dir, (num_stars,), minval=-1.0, maxval=1.0)
    phi = jax.random.uniform(jax.random.fold_in(k_dir, 1),
                             (num_stars,)) * 2.0 * math.pi
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    positions = jnp.stack([radii * s * jnp.cos(phi),
                           radii * s * jnp.sin(phi),
                           radii * z], axis=-1)

    sigma = jnp.sqrt(G * total_mass
                     / (6.0 * jnp.sqrt(radii * radii + a * a)))
    velocities = jax.random.normal(k_v, (num_stars, 3)) * sigma[:, None]
    masses = jnp.ones((num_stars,), jnp.float32)
    return (positions.astype(jnp.float32), velocities.astype(jnp.float32),
            masses)


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
