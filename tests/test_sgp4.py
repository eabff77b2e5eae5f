"""Vendored near-Earth SGP4 core: physical-property validation.

No sgp4 library exists in this environment to diff against, so the
oracle is physics: orbit geometry from the TLE itself, the J2 analytic
secular rates, Kepler's third law, and drag-decay sign.
"""

import math

import numpy as np
import pytest

from nbody_tpu.experiments import _sgp4
from nbody_tpu.experiments.orbital_audit import (
    TLE_FIXTURES,
    kepler_j2_reference,
    parse_tle,
)

ISS_L1, ISS_L2 = TLE_FIXTURES["ISS"]


@pytest.fixture(scope="module")
def iss():
    return _sgp4.SGP4(_sgp4.elements_from_tle(ISS_L1, ISS_L2))


def test_tle_exp_field_parsing():
    assert _sgp4._parse_exp_field(" 10270-3") == pytest.approx(0.10270e-3)
    assert _sgp4._parse_exp_field("-11606-4") == pytest.approx(-0.11606e-4)
    assert _sgp4._parse_exp_field(" 00000+0") == 0.0
    assert _sgp4._parse_exp_field(" 00000-0") == 0.0


def test_iss_epoch_state_geometry(iss):
    pos, vel = iss.propagate(0.0)
    r = math.sqrt(sum(x * x for x in pos))
    v = math.sqrt(sum(x * x for x in vel))
    # ISS: ~420 km altitude, ~7.66 km/s circular speed
    assert 6700.0 < r < 6850.0, r
    assert 7.5 < v < 7.8, v
    # inclination from the angular momentum vector
    h = np.cross(pos, vel)
    inc = math.degrees(math.acos(h[2] / np.linalg.norm(h)))
    assert abs(inc - 51.64) < 0.2, inc


def test_iss_orbital_period_keplers_third_law(iss):
    """Radial distance returns to its initial value after one period
    implied by the recovered Brouwer mean motion."""
    period_min = iss.period_min
    assert abs(period_min - 1440.0 / 15.4955) < 0.5
    r0 = np.linalg.norm(iss.propagate(0.0)[0])
    r1 = np.linalg.norm(iss.propagate(period_min)[0])
    r_half = np.linalg.norm(iss.propagate(period_min / 2)[0])
    assert abs(r1 - r0) < 5.0  # back to the same radius
    # eccentric orbit: half period is measurably different (apsis swap)
    assert abs(r_half - r0) > abs(r1 - r0)


def test_iss_nodal_regression_matches_j2_analytic(iss):
    """Secular RAAN rate vs the textbook J2 formula (~-5 deg/day for
    the ISS)."""
    el = iss.el
    a = iss.aodp * _sgp4.XKMPER
    n = iss.xnodp / 60.0  # rad/s
    p = a * (1 - el.ecco ** 2)
    analytic = (-1.5 * _sgp4.J2 * (_sgp4.XKMPER / p) ** 2
                * n * math.cos(el.inclo))  # rad/s
    got = iss.nodedot / 60.0  # rad/s
    assert got == pytest.approx(analytic, rel=0.02)
    deg_day = math.degrees(got) * 86400
    assert -5.5 < deg_day < -4.5, deg_day


def test_iss_drag_decays_orbit(iss):
    """Positive B* must shrink the orbit monotonically over days."""
    day = 1440.0
    r_mean = []
    for k in range(3):
        rs = [np.linalg.norm(iss.propagate(k * day + f)[0])
              for f in np.linspace(0, iss.period_min, 32, endpoint=False)]
        r_mean.append(np.mean(rs))
    assert r_mean[0] > r_mean[1] > r_mean[2]
    # ISS-magnitude decay: hundreds of metres to a few km per day
    assert 0.01 < (r_mean[0] - r_mean[2]) / 2 < 5.0


def test_sgp4_tracks_kepler_j2_oracle_iss():
    """Over 3 h the two oracles (SGP4 vs Keplerian+J2-secular) model the
    same dominant physics and must agree to tens of km; a frame or
    Kepler-solve bug would diverge by thousands."""
    times = [600.0 * k for k in range(1, 19)]  # 10 min .. 3 h
    sgp4_pos = _sgp4.sgp4_ephemeris(ISS_L1, ISS_L2, times)
    el = parse_tle(ISS_L1, ISS_L2)
    j2_pos = kepler_j2_reference(el, times)
    sep = np.linalg.norm(sgp4_pos - j2_pos, axis=1)
    assert sep.max() < 100.0, sep.max()


def test_deep_space_tles_are_refused():
    """GPS (12 h) and LAGEOS (225.4 min) are deep-space class: the
    near-Earth core must refuse them so the audit falls back to the
    J2 oracle instead of silently extrapolating."""
    for name in ("GPS-IIR-2", "LAGEOS-1"):
        l1, l2 = TLE_FIXTURES[name]
        with pytest.raises(ValueError, match="deep-space"):
            _sgp4.sgp4_ephemeris(l1, l2, [0.0])


def test_low_perigee_simplified_branch():
    """A sub-220 km-perigee TLE exercises the simplified-drag branch."""
    l1 = ("1 99999U 24001A   24001.50000000  .00050000  00000-0  "
          "20000-3 0  9991")
    l2 = ("2 99999  28.5000 100.0000 0012000  50.0000 310.0000 "
          "16.20000000    12")
    prop = _sgp4.SGP4(_sgp4.elements_from_tle(l1, l2))
    assert prop.simple
    pos, vel = prop.propagate(30.0)
    r = np.linalg.norm(pos)
    assert 6500.0 < r < 6800.0
    assert np.isfinite(pos).all() and np.isfinite(vel).all()
