"""Orbital audit: real-satellite dynamics vs precision-degraded physics.

TPU-native equivalent of the reference audit
(reference: orbital_audit.py:75-1156). Environment mapping:

* the reference fetches TLEs from CelesTrak with a cached ISS fallback
  (reference: :89-111, :337-340); this environment has zero egress, so the
  cached-fixture path IS the path — TLE fixtures below;
* the reference wraps the ``sgp4`` library (not installed here); this
  framework VENDORS the full SGP4/SDP4 core (``experiments/_sgp4.py``,
  Spacetrack Report #3 equations: Brouwer recovery, B* drag series,
  J2/J3/J4 secular + periodic terms; lunisolar secular + periodic and
  12h/24h resonance terms for deep-space TLEs, period >= 225 min) and
  uses it as the oracle for EVERY TLE — the same coverage as the
  reference's library wrapper (reference: orbital_audit.py:147-182);
  each row records which branch (sgp4/sdp4) produced it;
* the device simulator is an RK4 two-body + J2 integrator under
  ``lax.scan`` with the precision ladder applied to r^2 (the same
  "broken math" hook as the galaxy engine) and underflow/overflow event
  logging (reference: :185-301).

Sections: TLE-vs-device drift per precision mode; Lense-Thirring /
lattice-torsion precession vs Gravity Probe B (37.2 +/- 7.2 mas/yr,
reference: :465-609); eccentric-orbit telemetry glitch correlation
(reference: :626-795); geocentric-vs-heliocentric FLOP cost
(reference: :813-962); combined score.

Usage:
    python -m nbody_tpu.experiments.orbital_audit --quick
"""

from __future__ import annotations

import argparse
import functools
import json
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.ops.precision import Precision, Quantizer, f16_roundtrip

MU_EARTH = 398600.4418        # km^3/s^2
R_EARTH = 6378.137            # km
J2_EARTH = 1.08262668e-3
GPB_FRAME_DRAG_MAS_YR = 37.2  # Gravity Probe B measured (reference: :471)
GPB_ERROR_MAS_YR = 7.2

# Cached TLE fixtures (reference fallback pattern, orbital_audit.py:337-340)
TLE_FIXTURES = {
    "ISS": ("1 25544U 98067A   24001.50000000  .00016717  00000-0  "
            "10270-3 0  9000",
            "2 25544  51.6400 208.9163 0006317  69.9862 290.2000 "
            "15.49550000430000"),
    "LAGEOS-1": ("1 08820U 76039A   24001.50000000 -.00000010  00000-0  "
                 "00000+0 0  9990",
                 "2 08820 109.8500 200.0000 0044000 260.0000 100.0000 "
                 "06.38664800000000"),
    "GPS-IIR-2": ("1 24876U 97035A   24001.50000000  .00000020  00000-0  "
                  "00000+0 0  9990",
                  "2 24876  55.0000 150.0000 0080000 200.0000 160.0000 "
                  "02.00561900000000"),
}


CELESTRAK_URL = ("https://celestrak.org/NORAD/elements/gp.php"
                 "?GROUP=stations&FORMAT=tle")


def fetch_tles(url: str = CELESTRAK_URL, timeout_s: float = 5.0) -> dict:
    """Live CelesTrak fetch with the reference's cached-fallback pattern
    (reference: orbital_audit.py:89-111, 337-340).

    Returns ``(tles, source)`` where tles maps satellite name -> (l1, l2).
    Any failure (this box is zero-egress, so here it ALWAYS falls back)
    returns the cached fixtures — the same behavior the reference
    exhibits offline. Fetched satellites matching a fixture name prefix
    replace that fixture; others are ignored (the audit's physics spans
    LEO/MEO/lageos regimes deliberately)."""
    try:
        from urllib.request import urlopen

        with urlopen(url, timeout=timeout_s) as resp:
            text = resp.read().decode("utf-8", "replace")
        lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
        fetched = {}
        for i in range(0, len(lines) - 2, 3):
            name, l1, l2 = lines[i], lines[i + 1], lines[i + 2]
            if l1.startswith("1 ") and l2.startswith("2 "):
                fetched[name] = (l1, l2)
        updated = dict(TLE_FIXTURES)
        hits = 0
        for name in updated:
            # match on the FULL fixture name (deterministic order): "ISS"
            # matches "ISS (ZARYA)"; "GPS-IIR-2" only a GPS-IIR-2 entry —
            # an unmatched fixture keeps its cached TLE rather than
            # silently adopting a different satellite's elements
            for fname in sorted(fetched):
                if fname.upper().startswith(name.upper()):
                    updated[name] = fetched[fname]
                    hits += 1
                    break
        if not hits:
            return TLE_FIXTURES, "fetch succeeded but no matching sats; " \
                                 "cached fixtures"
        return updated, f"live CelesTrak ({hits} updated)"
    except Exception as e:  # noqa: BLE001 — any network failure degrades
        return TLE_FIXTURES, (f"cached fixtures (fetch failed: "
                              f"{type(e).__name__})")


def parse_tle(line1: str, line2: str) -> dict:
    """Extract mean elements from a TLE pair (subset needed here)."""
    inc = float(line2[8:16])
    raan = float(line2[17:25])
    ecc = float("0." + line2[26:33].strip())
    argp = float(line2[34:42])
    mean_anom = float(line2[43:51])
    mean_motion = float(line2[52:63])  # rev/day
    n_rad_s = mean_motion * 2 * math.pi / 86400.0
    a = (MU_EARTH / n_rad_s ** 2) ** (1.0 / 3.0)
    return {"inclination_deg": inc, "raan_deg": raan, "eccentricity": ecc,
            "argp_deg": argp, "mean_anomaly_deg": mean_anom,
            "mean_motion_rev_day": mean_motion, "semi_major_axis_km": a}


def elements_to_state(el: dict):
    """Mean elements -> osculating position/velocity (km, km/s)."""
    a, e = el["semi_major_axis_km"], el["eccentricity"]
    i = math.radians(el["inclination_deg"])
    raan = math.radians(el["raan_deg"])
    argp = math.radians(el["argp_deg"])
    M = math.radians(el["mean_anomaly_deg"])
    # solve Kepler's equation
    E = M
    for _ in range(20):
        E = E - (E - e * math.sin(E) - M) / (1 - e * math.cos(E))
    nu = 2 * math.atan2(math.sqrt(1 + e) * math.sin(E / 2),
                        math.sqrt(1 - e) * math.cos(E / 2))
    r = a * (1 - e * math.cos(E))
    p = a * (1 - e * e)
    # perifocal
    rp = np.array([r * math.cos(nu), r * math.sin(nu), 0.0])
    vp = np.array([-math.sin(nu), e + math.cos(nu), 0.0]) * math.sqrt(
        MU_EARTH / p)
    # rotation to ECI
    cR, sR = math.cos(raan), math.sin(raan)
    cI, sI = math.cos(i), math.sin(i)
    cw, sw = math.cos(argp), math.sin(argp)
    R = np.array([
        [cR * cw - sR * sw * cI, -cR * sw - sR * cw * cI, sR * sI],
        [sR * cw + cR * sw * cI, -sR * sw + cR * cw * cI, -cR * sI],
        [sw * sI, cw * sI, cI],
    ])
    return R @ rp, R @ vp


def reference_ephemeris(el: dict, line1: str, line2: str, times_s):
    """Oracle positions at the sample times: the vendored SGP4/SDP4 core
    for every TLE (deep-space TLEs take the SDP4 lunisolar + resonance
    branch, matching the reference's library wrapper coverage,
    reference: orbital_audit.py:147-182). Returns (positions (T, 3),
    oracle_name) where oracle_name records which branch ran."""
    from nbody_tpu.experiments import _sgp4

    # One propagator serves both the flag and the samples (the deep-space
    # _dscom/_dsinit setup is the expensive part of construction). A
    # pathological TLE (e.g. a decaying object whose perturbed eccentricity
    # drifts out of [0, 1) over the horizon) raises inside the propagator;
    # the audit must still produce a row for it, so fall back to the
    # Kepler+J2 oracle and label it honestly — mirroring the reference's
    # behavior of always completing the audit table.
    # TLE parsing stays OUTSIDE the try: a malformed/corrupted TLE is a
    # data bug that must surface, not be silently relabeled as a
    # propagation fallback over possibly mis-parsed elements.
    elements = _sgp4.elements_from_tle(line1, line2)
    try:
        prop = _sgp4.SGP4(elements)
        pos = np.asarray([prop.propagate(t / 60.0)[0] for t in times_s])
        return pos, ("sdp4" if prop.is_deep_space else "sgp4")
    except (RuntimeError, ValueError):
        return kepler_j2_reference(el, times_s), "kepler_j2(fallback)"


def kepler_j2_reference(el: dict, times_s):
    """Host reference ephemeris at the given sample times: Keplerian
    motion + J2 secular drift of RAAN/argp (the deep-space fallback
    oracle; dominant terms for LEO/MEO). Taking explicit times keeps the
    comparison aligned with the device propagator's sample instants."""
    a, e = el["semi_major_axis_km"], el["eccentricity"]
    i = math.radians(el["inclination_deg"])
    n = math.sqrt(MU_EARTH / a ** 3)
    p = a * (1 - e * e)
    fac = 1.5 * J2_EARTH * (R_EARTH / p) ** 2 * n
    raan_dot = -fac * math.cos(i)
    argp_dot = fac * (2 - 2.5 * math.sin(i) ** 2)
    out = []
    for t in times_s:
        el_t = dict(el)
        el_t["mean_anomaly_deg"] = (el["mean_anomaly_deg"]
                                    + math.degrees(n * t)) % 360.0
        el_t["raan_deg"] = el["raan_deg"] + math.degrees(raan_dot * t)
        el_t["argp_deg"] = el["argp_deg"] + math.degrees(argp_dot * t)
        pos, _ = elements_to_state(el_t)
        out.append(pos)
    return np.asarray(out)


# --------------------------------------------------------------------------
# Device RK4 + J2 propagator with the precision ladder
# --------------------------------------------------------------------------

def _accel(pos, q: Quantizer):
    """Two-body + J2 acceleration with the precision hook on r^2."""
    r_sq = jnp.sum(pos * pos)
    if q.mode == Precision.BFLOAT16:
        r_sq = r_sq.astype(jnp.bfloat16).astype(jnp.float32)
    elif q.mode == Precision.FLOAT16:
        r_sq = f16_roundtrip(r_sq)
    elif q.is_int:
        # single-value log-grid snap around Earth-orbit scales
        from nbody_tpu.ops.precision import grid_quantize_safe
        r_sq = grid_quantize_safe(r_sq[None], q.levels, min_val=R_EARTH ** 2,
                                  log_lo=jnp.log(jnp.float32(R_EARTH ** 2)),
                                  log_hi=jnp.log(jnp.float32((20 * R_EARTH) ** 2))
                                  )[0]
    r = jnp.sqrt(r_sq)
    a_kepler = -MU_EARTH / (r ** 3) * pos
    x, y, z = pos
    j2f = 1.5 * J2_EARTH * MU_EARTH * R_EARTH ** 2 / r ** 5
    a_j2 = jnp.stack([
        j2f * x * (5 * z * z / r_sq - 1),
        j2f * y * (5 * z * z / r_sq - 1),
        j2f * z * (5 * z * z / r_sq - 3),
    ])
    acc = a_kepler + a_j2
    if q.is_int:
        # Component-wise force quantization (reference semantics,
        # quantization.py:74-88 applied per step): the linear grid acts on
        # Cartesian components, which is NOT rotationally symmetric — this
        # axis-aligned "lattice" bias is the torsion source the
        # Lense-Thirring audit measures.
        from nbody_tpu.ops.precision import grid_quantize
        acc = grid_quantize(acc, q.levels)
    return acc


@functools.partial(jax.jit, static_argnames=("q", "num_steps", "sample_every"))
def propagate_rk4(pos0, vel0, dt: float, q: Quantizer, num_steps: int,
                  sample_every: int):
    """RK4 under lax.scan with underflow/overflow counting
    (reference: orbital_audit.py:185-301)."""

    def deriv(state):
        p, v = state
        return v, _accel(p, q)

    def step(carry, _):
        p, v, under, over = carry
        k1p, k1v = deriv((p, v))
        k2p, k2v = deriv((p + 0.5 * dt * k1p, v + 0.5 * dt * k1v))
        k3p, k3v = deriv((p + 0.5 * dt * k2p, v + 0.5 * dt * k2v))
        k4p, k4v = deriv((p + dt * k3p, v + dt * k3v))
        p = p + dt / 6.0 * (k1p + 2 * k2p + 2 * k3p + k4p)
        v = v + dt / 6.0 * (k1v + 2 * k2v + 2 * k3v + k4v)
        r = jnp.linalg.norm(p)
        under = under + jnp.int32(r < 1e-10)
        over = over + jnp.int32(~jnp.isfinite(r))
        return (p, v, under, over), None

    def chunk(carry, _):
        carry, _ = jax.lax.scan(step, carry, None, length=sample_every)
        return carry, carry[0]

    n_chunks = num_steps // sample_every
    carry, samples = jax.lax.scan(
        chunk, (pos0, vel0, jnp.int32(0), jnp.int32(0)), None,
        length=n_chunks)
    return samples, carry[2], carry[3]


# --------------------------------------------------------------------------
# Audit sections
# --------------------------------------------------------------------------

def tle_drift_audit(duration_hours: float = 6.0, dt: float = 10.0,
                    tles: dict | None = None) -> dict:
    """Device RK4 vs reference ephemeris per satellite and precision
    (reference: orbital_audit.py:321-448)."""
    print("\n--- AUDIT 1: TLE vs DEVICE-PROPAGATION DRIFT ---")
    duration_s = duration_hours * 3600.0
    results = {}
    for name, (l1, l2) in (tles or TLE_FIXTURES).items():
        el = parse_tle(l1, l2)
        pos0, vel0 = elements_to_state(el)
        num_steps = int(duration_s / dt)
        sample_every = max(num_steps // 50, 1)
        n_samples = num_steps // sample_every
        # device samples land at t = (j+1) * sample_every * dt exactly
        times = [(j + 1) * sample_every * dt for j in range(n_samples)]
        ref, oracle = reference_ephemeris(el, l1, l2, times)
        row = {"elements": el, "oracle": oracle}
        for mode in (Precision.FLOAT32, Precision.FLOAT16,
                     Precision.INT4_SIM):
            q = Quantizer(mode)
            samples, under, over = propagate_rk4(
                jnp.asarray(pos0, jnp.float32),
                jnp.asarray(vel0, jnp.float32), dt, q,
                num_steps // sample_every * sample_every, sample_every)
            sim = np.asarray(samples)
            k = min(len(sim), len(ref))
            drift = np.linalg.norm(sim[:k] - ref[:k], axis=1)
            row[mode.value] = {
                "final_drift_km": float(drift[-1]),
                "max_drift_km": float(drift.max()),
                "underflows": int(under),
                "overflows": int(over),
            }
            print(f"  {name:10s} {mode.value:9s}: final drift "
                  f"{drift[-1]:10.2f} km over {duration_hours:.0f}h "
                  f"[oracle: {oracle}]")
        # int4 signature: drift ratio vs float32
        f32 = row["float32"]["final_drift_km"]
        row["int4_signature"] = (row["int4_sim"]["final_drift_km"]
                                 / max(f32, 1e-9))
        results[name] = row
    return results


def lense_thirring_audit(num_years: float = 1.0) -> dict:
    """Lattice-torsion precession vs Gravity Probe B
    (reference: orbital_audit.py:465-609): measure the spurious nodal
    precession the int4 lattice induces on a polar orbit and compare with
    the real frame-dragging rate."""
    print("\n--- AUDIT 2: LENSE-THIRRING / LATTICE TORSION ---")
    el = {"inclination_deg": 90.0, "raan_deg": 0.0, "eccentricity": 0.001,
          "argp_deg": 0.0, "mean_anomaly_deg": 0.0,
          "mean_motion_rev_day": 14.0,
          "semi_major_axis_km": (MU_EARTH / (14.0 * 2 * math.pi / 86400.0)
                                 ** 2) ** (1 / 3)}
    pos0, vel0 = elements_to_state(el)
    dt, hours = 10.0, 12.0
    num_steps = int(hours * 3600 / dt)
    sample_every = max(num_steps // 100, 1)
    rates = {}
    for mode in (Precision.FLOAT32, Precision.INT8_SIM,
                 Precision.INT4_SIM):
        samples, _, _ = propagate_rk4(
            jnp.asarray(pos0, jnp.float32), jnp.asarray(vel0, jnp.float32),
            dt, Quantizer(mode), num_steps // sample_every * sample_every,
            sample_every)
        s = np.asarray(samples)
        # node line: cross product of successive orbit normals
        h = np.cross(s[:-1], np.diff(s, axis=0))
        h = h / (np.linalg.norm(h, axis=1, keepdims=True) + 1e-12)
        raan = np.unwrap(np.arctan2(h[:, 0], -h[:, 1]))
        rate_rad_s = np.polyfit(
            np.arange(len(raan)) * dt * sample_every, raan, 1)[0]
        mas_yr = math.degrees(rate_rad_s) * 3600e3 * 86400 * 365.25
        rates[mode.value] = mas_yr
        print(f"  {mode.value:9s}: nodal precession {mas_yr:+.1f} mas/yr")
    torsion = abs(rates["int4_sim"] - rates["float32"])
    print(f"  lattice torsion (int4 - f32): {torsion:.1f} mas/yr vs "
          f"GP-B frame dragging {GPB_FRAME_DRAG_MAS_YR} +/- "
          f"{GPB_ERROR_MAS_YR}")
    return {"rates_mas_yr": rates, "lattice_torsion_mas_yr": torsion,
            "gpb_reference": GPB_FRAME_DRAG_MAS_YR,
            "within_gpb_band": bool(abs(torsion - GPB_FRAME_DRAG_MAS_YR)
                                    < GPB_ERROR_MAS_YR)}


def telemetry_glitch_audit() -> dict:
    """Eccentric-orbit glitch correlation (reference: orbital_audit.py:
    626-795): does int4 produce extra jerk near perigee (small r = coarse
    log-grid cells)?"""
    print("\n--- AUDIT 3: ECCENTRIC-ORBIT TELEMETRY GLITCHES ---")
    el = {"inclination_deg": 63.4, "raan_deg": 0.0, "eccentricity": 0.7,
          "argp_deg": 270.0, "mean_anomaly_deg": 0.0,
          "mean_motion_rev_day": 2.0,
          "semi_major_axis_km": (MU_EARTH / (2.0 * 2 * math.pi / 86400.0)
                                 ** 2) ** (1 / 3)}
    pos0, vel0 = elements_to_state(el)
    dt = 20.0
    num_steps = 4000
    sample_every = 10
    out = {}
    for mode in (Precision.FLOAT32, Precision.INT4_SIM):
        samples, _, _ = propagate_rk4(
            jnp.asarray(pos0, jnp.float32), jnp.asarray(vel0, jnp.float32),
            dt, Quantizer(mode), num_steps, sample_every)
        s = np.asarray(samples)
        r = np.linalg.norm(s, axis=1)
        jerk = np.abs(np.diff(s, n=2, axis=0)).sum(axis=1)
        # correlate glitchiness with 1/r (perigee proximity)
        corr = float(np.corrcoef(1.0 / r[:-2], jerk)[0, 1])
        out[mode.value] = {"perigee_km": float(r.min()),
                           "apogee_km": float(r.max()),
                           "jerk_perigee_correlation": corr}
        print(f"  {mode.value:9s}: corr(1/r, jerk) = {corr:+.3f}")
    return out


def flop_cost_audit() -> dict:
    """Geocentric vs heliocentric computational cost
    (reference: orbital_audit.py:813-962): epicycles are more expensive
    to simulate than Kepler ellipses — counted analytically."""
    print("\n--- AUDIT 4: GEOCENTRIC vs HELIOCENTRIC FLOP COST ---")
    # per-step flop estimates: Kepler 2-body ~60 flops; epicycle stack of
    # k circles ~ 8k flops for the same fidelity (deferents+epicycles)
    kepler_flops = 60
    epicycle_terms = 84  # Ptolemaic-equivalent term count for Mars-quality
    epicycle_flops = 8 * epicycle_terms
    ratio = epicycle_flops / kepler_flops
    print(f"  heliocentric Kepler: ~{kepler_flops} flops/step; "
          f"geocentric epicycles: ~{epicycle_flops} flops/step "
          f"({ratio:.1f}x)")
    print("  -> a lazy simulator would pick heliocentric physics: "
          "consistency check passed")
    return {"kepler_flops": kepler_flops, "epicycle_flops": epicycle_flops,
            "ratio": ratio, "simulator_prefers_heliocentric": True}


def run_full_orbital_audit(quick: bool = False, fetch: bool = False) -> dict:
    """(reference: orbital_audit.py:982-1079)"""
    if fetch:
        tles, tle_source = fetch_tles()
        print(f"  TLE source: {tle_source}")
    else:
        tles, tle_source = TLE_FIXTURES, "cached fixtures (--fetch not set)"
    report = {
        "tle_drift": tle_drift_audit(2.0 if quick else 6.0, tles=tles),
        "lense_thirring": lense_thirring_audit(),
        "telemetry_glitches": telemetry_glitch_audit(),
        "flop_cost": flop_cost_audit(),
        "tle_source": tle_source,
        "notes": ("TLE source recorded per run (--fetch tries CelesTrak "
                  "with the reference's cached-fallback pattern, "
                  "orbital_audit.py:89-111; this box is zero-egress so "
                  "the fallback is what runs here); oracle = vendored "
                  "SGP4/SDP4 core (experiments/_sgp4.py) — deep-space "
                  "TLEs (period >= 225 min) take the SDP4 lunisolar + "
                  "resonance branch"),
    }
    sig = np.mean([r["int4_signature"]
                   for r in report["tle_drift"].values()
                   if isinstance(r, dict) and "int4_signature" in r])
    report["score"] = {
        "mean_int4_drift_amplification": float(sig),
        "int4_signature_detected": bool(sig > 2.0),
    }
    print(f"\n  AUDIT SCORE: int4 drift amplification x{sig:.1f} "
          f"({'SIGNATURE DETECTED' if sig > 2.0 else 'weak'})")
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description="Orbital audit")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--fetch", action="store_true",
                   help="try a live CelesTrak TLE fetch before falling "
                        "back to the cached fixtures (reference pattern)")
    p.add_argument("--output", type=str, default="output/orbital")
    args = p.parse_args(argv)

    print("\n" + "=" * 60)
    print("ORBITAL AUDIT: satellites vs the precision ladder")
    print("=" * 60)
    report = run_full_orbital_audit(args.quick, fetch=args.fetch)
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    (out / "orbital_audit_report.json").write_text(
        json.dumps(report, indent=2, default=str))


if __name__ == "__main__":
    main()
