"""Minimal vendored SGP4 propagator (near-Earth, pure Python).

The reference audit wraps the ``sgp4`` PyPI library as its ephemeris
oracle (reference: orbital_audit.py:147-182). That library is not
available in this environment, so this module vendors the near-Earth
SGP4 algorithm itself — the classic Spacetrack Report #3 formulation
(Hoots & Roehrich 1980; Vallado et al. 2006 corrections), WGS-72
gravity constants, implemented from the published equations:

* Brouwer mean-motion recovery from the Kozai TLE mean motion;
* atmospheric-drag secular terms (C1..C5, D2..D4 power series in the
  B* ballistic coefficient), with the simplified series below 220 km
  perigee and the s4 density-boundary adjustment below 156 km;
* J2/J4 secular rates of M, argument of perigee, and RAAN;
* long-period (J3) and short-period (J2) periodic corrections;
* Kepler solve for E + omega by Newton iteration.

Scope: near-Earth only (orbital period < 225 min). Deep-space TLEs
(SDP4's lunar/solar and resonance terms) are out of scope; callers fall
back to the Keplerian+J2 secular oracle for those (the audit labels
which oracle each satellite used).

Validation: tests/test_sgp4.py checks ISS-class TLEs for altitude,
speed, orbital period, nodal-regression rate against the J2 analytic
value, and drag-induced decay sign.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

# WGS-72 constants (Spacetrack Report #3)
XKE = 0.0743669161        # sqrt(GM) in (earth radii)^1.5 / min
XKMPER = 6378.135         # km per earth radius
J2 = 1.082616e-3
J3 = -2.53881e-6
J4 = -1.65597e-6
CK2 = 0.5 * J2            # = k2 / aE^2 in canonical units
CK4 = -0.375 * J4
A3OVK2 = -J3 / CK2        # A30 / k2
QOMS2T = 1.88027916e-9    # (q0 - s)^4 in er^4, q0 = 120 km, s = 78 km
S_CONST = 1.01222928      # s = 1 + 78/XKMPER er
TWOPI = 2.0 * math.pi
MINUTES_PER_DAY = 1440.0
DEEP_SPACE_PERIOD_MIN = 225.0


@dataclass
class SGP4Elements:
    """Parsed TLE mean elements in SGP4's working units."""

    no_kozai: float   # mean motion, rad/min (Kozai)
    ecco: float       # eccentricity
    inclo: float      # inclination, rad
    nodeo: float      # RAAN, rad
    argpo: float      # argument of perigee, rad
    mo: float         # mean anomaly, rad
    bstar: float      # drag term, 1/earth-radii


def _parse_exp_field(field: str) -> float:
    """TLE assumed-decimal exponent field, e.g. ' 10270-3' -> 0.10270e-3."""
    field = field.strip()
    if not field or field in ("+", "-"):
        return 0.0
    mantissa_sign = -1.0 if field[0] == "-" else 1.0
    body = field.lstrip("+-")
    exp_sign = 1
    if "-" in body:
        mant, _, exp = body.partition("-")
        exp_sign = -1
    elif "+" in body:
        mant, _, exp = body.partition("+")
    else:
        mant, exp = body, "0"
    mant = mant.strip() or "0"
    exp = exp.strip() or "0"
    return mantissa_sign * float(f"0.{mant}") * 10.0 ** (exp_sign * int(exp))


def elements_from_tle(line1: str, line2: str) -> SGP4Elements:
    no_rev_day = float(line2[52:63])
    return SGP4Elements(
        no_kozai=no_rev_day * TWOPI / MINUTES_PER_DAY,
        ecco=float("0." + line2[26:33].strip()),
        inclo=math.radians(float(line2[8:16])),
        nodeo=math.radians(float(line2[17:25])),
        argpo=math.radians(float(line2[34:42])),
        mo=math.radians(float(line2[43:51])),
        bstar=_parse_exp_field(line1[53:61]),
    )


class SGP4:
    """Near-Earth SGP4 initialised from mean elements.

    ``propagate(tsince_min)`` returns (position_km (3,), velocity_km_s
    (3,)) in the TEME frame, matching the sgp4 library's convention the
    reference relied on.
    """

    def __init__(self, el: SGP4Elements):
        self.el = el
        e0 = el.ecco
        i0 = el.inclo

        cosio = math.cos(i0)
        theta2 = cosio * cosio
        x3thm1 = 3.0 * theta2 - 1.0
        eosq = e0 * e0
        betao2 = 1.0 - eosq
        betao = math.sqrt(betao2)

        # Brouwer mean motion / semi-major axis recovery
        a1 = (XKE / el.no_kozai) ** (2.0 / 3.0)
        del1 = 1.5 * CK2 * x3thm1 / (a1 * a1 * betao * betao2)
        a0 = a1 * (1.0 - del1 * (1.0 / 3.0 + del1 * (1.0
                   + 134.0 / 81.0 * del1)))
        del0 = 1.5 * CK2 * x3thm1 / (a0 * a0 * betao * betao2)
        self.xnodp = el.no_kozai / (1.0 + del0)       # rad/min
        self.aodp = a0 / (1.0 - del0)                 # earth radii

        self.period_min = TWOPI / self.xnodp
        self.is_deep_space = self.period_min >= DEEP_SPACE_PERIOD_MIN

        # perigee-dependent density constants
        perigee_km = (self.aodp * (1.0 - e0) - 1.0) * XKMPER
        s4 = S_CONST
        qoms24 = QOMS2T
        if perigee_km < 156.0:
            s4 = max(perigee_km - 78.0, 20.0)
            qoms24 = ((120.0 - s4) / XKMPER) ** 4
            s4 = s4 / XKMPER + 1.0
        self.simple = perigee_km < 220.0

        pinvsq = 1.0 / (self.aodp * self.aodp * betao2 * betao2)
        tsi = 1.0 / (self.aodp - s4)
        self.eta = self.aodp * e0 * tsi
        etasq = self.eta * self.eta
        eeta = e0 * self.eta
        psisq = abs(1.0 - etasq)
        coef = qoms24 * tsi ** 4
        coef1 = coef / psisq ** 3.5
        c2 = (coef1 * self.xnodp
              * (self.aodp * (1.0 + 1.5 * etasq + eeta * (4.0 + etasq))
                 + 0.75 * CK2 * tsi / psisq * x3thm1
                 * (8.0 + 3.0 * etasq * (8.0 + etasq))))
        self.c1 = el.bstar * c2
        sinio = math.sin(i0)
        a3ovk2 = A3OVK2
        c3 = 0.0
        if e0 > 1.0e-4:
            c3 = coef * tsi * a3ovk2 * self.xnodp * sinio / e0
        self.c3 = c3
        x1mth2 = 1.0 - theta2
        self.c4 = (2.0 * self.xnodp * coef1 * self.aodp * betao2
                   * (self.eta * (2.0 + 0.5 * etasq)
                      + e0 * (0.5 + 2.0 * etasq)
                      - 2.0 * CK2 * tsi / (self.aodp * psisq)
                      * (-3.0 * x3thm1 * (1.0 - 2.0 * eeta
                                          + etasq * (1.5 - 0.5 * eeta))
                         + 0.75 * x1mth2
                         * (2.0 * etasq - eeta * (1.0 + etasq))
                         * math.cos(2.0 * el.argpo))))
        self.c5 = (2.0 * coef1 * self.aodp * betao2
                   * (1.0 + 2.75 * (etasq + eeta) + eeta * etasq))

        # secular rates (J2, J4)
        temp1 = 3.0 * CK2 * pinvsq * self.xnodp
        temp2 = temp1 * CK2 * pinvsq
        temp3 = 1.25 * CK4 * pinvsq * pinvsq * self.xnodp
        x1m5th = 1.0 - 5.0 * theta2
        self.mdot = (self.xnodp
                     + 0.5 * temp1 * betao * x3thm1
                     + 0.0625 * temp2 * betao
                     * (13.0 - 78.0 * theta2 + 137.0 * theta2 * theta2))
        self.argpdot = (-0.5 * temp1 * x1m5th
                        + 0.0625 * temp2
                        * (7.0 - 114.0 * theta2 + 395.0 * theta2 * theta2)
                        + temp3 * (3.0 - 36.0 * theta2
                                   + 49.0 * theta2 * theta2))
        xhdot1 = -temp1 * cosio
        self.nodedot = (xhdot1
                        + (0.5 * temp2 * (4.0 - 19.0 * theta2)
                           + 2.0 * temp3 * (3.0 - 7.0 * theta2)) * cosio)
        self.xnodcf = 3.5 * betao2 * xhdot1 * self.c1
        self.t2cof = 1.5 * self.c1
        if abs(cosio + 1.0) > 1.5e-12:
            self.xlcof = (0.125 * a3ovk2 * sinio
                          * (3.0 + 5.0 * cosio) / (1.0 + cosio))
        else:
            self.xlcof = (0.125 * a3ovk2 * sinio
                          * (3.0 + 5.0 * cosio) / 1.5e-12)
        self.aycof = 0.25 * a3ovk2 * sinio
        self.delmo = (1.0 + self.eta * math.cos(el.mo)) ** 3
        self.sinmo = math.sin(el.mo)
        self.x7thm1 = 7.0 * theta2 - 1.0
        self.omgcof = el.bstar * c3 * math.cos(el.argpo)
        self.xmcof = 0.0
        if e0 > 1.0e-4:
            self.xmcof = -(2.0 / 3.0) * coef * el.bstar / eeta

        if not self.simple:
            c1sq = self.c1 * self.c1
            self.d2 = 4.0 * self.aodp * tsi * c1sq
            temp = self.d2 * tsi * self.c1 / 3.0
            self.d3 = (17.0 * self.aodp + s4) * temp
            self.d4 = (0.5 * temp * self.aodp * tsi
                       * (221.0 * self.aodp + 31.0 * s4) * self.c1)
            self.t3cof = self.d2 + 2.0 * c1sq
            self.t4cof = 0.25 * (3.0 * self.d3
                                 + self.c1 * (12.0 * self.d2 + 10.0 * c1sq))
            self.t5cof = 0.2 * (3.0 * self.d4 + 12.0 * self.c1 * self.d3
                                + 6.0 * self.d2 * self.d2
                                + 15.0 * c1sq * (2.0 * self.d2 + c1sq))
        else:
            self.d2 = self.d3 = self.d4 = 0.0
            self.t3cof = self.t4cof = self.t5cof = 0.0

        # cached trig
        self.cosio = cosio
        self.sinio = sinio
        self.x3thm1 = x3thm1
        self.x1mth2 = x1mth2

    def propagate(self, tsince: float):
        """Position (km) and velocity (km/s) at tsince minutes from epoch."""
        el = self.el
        # secular gravity + drag
        xmdf = el.mo + self.mdot * tsince
        argpdf = el.argpo + self.argpdot * tsince
        xnoddf = el.nodeo + self.nodedot * tsince
        argp = argpdf
        xmp = xmdf
        tsq = tsince * tsince
        xnode = xnoddf + self.xnodcf * tsq
        tempa = 1.0 - self.c1 * tsince
        tempe = el.bstar * self.c4 * tsince
        templ = self.t2cof * tsq
        if not self.simple:
            delomg = self.omgcof * tsince
            delm = self.xmcof * ((1.0 + self.eta * math.cos(xmdf)) ** 3
                                 - self.delmo)
            temp = delomg + delm
            xmp = xmdf + temp
            argp = argpdf - temp
            tcube = tsq * tsince
            tfour = tsince * tcube
            tempa = tempa - self.d2 * tsq - self.d3 * tcube - self.d4 * tfour
            tempe = tempe + el.bstar * self.c5 * (math.sin(xmp) - self.sinmo)
            templ = templ + self.t3cof * tcube + tfour * (self.t4cof
                                                          + tsince * self.t5cof)
        a = self.aodp * tempa * tempa
        e = el.ecco - tempe
        e = min(max(e, 1.0e-6), 0.999999)
        xl = xmp + argp + xnode + self.xnodp * templ

        beta = math.sqrt(1.0 - e * e)
        xn = XKE / a ** 1.5

        # long-period periodics
        axn = e * math.cos(argp)
        temp = 1.0 / (a * beta * beta)
        xll = temp * self.xlcof * axn
        aynl = temp * self.aycof
        xlt = xl + xll
        ayn = e * math.sin(argp) + aynl

        # Kepler solve for E + omega
        capu = math.fmod(xlt - xnode, TWOPI)
        epw = capu
        for _ in range(10):
            sinepw = math.sin(epw)
            cosepw = math.cos(epw)
            f = capu - epw + ayn * cosepw - axn * sinepw
            df = -1.0 + axn * cosepw + ayn * sinepw
            delta = -f / df
            if abs(delta) > 0.95:
                delta = math.copysign(0.95, delta)
            epw = epw + delta
            if abs(delta) < 1.0e-12:
                break
        sinepw = math.sin(epw)
        cosepw = math.cos(epw)

        # short-period preliminaries
        ecose = axn * cosepw + ayn * sinepw
        esine = axn * sinepw - ayn * cosepw
        elsq = axn * axn + ayn * ayn
        pl = a * (1.0 - elsq)
        r = a * (1.0 - ecose)
        rdot = XKE * math.sqrt(a) * esine / r
        rfdot = XKE * math.sqrt(pl) / r
        betal = math.sqrt(1.0 - elsq)
        temp = esine / (1.0 + betal)
        cosu = a / r * (cosepw - axn + ayn * temp)
        sinu = a / r * (sinepw - ayn - axn * temp)
        u = math.atan2(sinu, cosu)
        sin2u = 2.0 * sinu * cosu
        cos2u = 2.0 * cosu * cosu - 1.0
        temp = 1.0 / pl
        temp1 = CK2 * temp
        temp2 = temp1 * temp

        # short-period periodics
        rk = (r * (1.0 - 1.5 * temp2 * betal * self.x3thm1)
              + 0.5 * temp1 * self.x1mth2 * cos2u)
        uk = u - 0.25 * temp2 * self.x7thm1 * sin2u
        xnodek = xnode + 1.5 * temp2 * self.cosio * sin2u
        xinck = el.inclo + 1.5 * temp2 * self.cosio * self.sinio * cos2u
        rdotk = rdot - xn * temp1 * self.x1mth2 * sin2u
        rfdotk = rfdot + xn * temp1 * (self.x1mth2 * cos2u
                                       + 1.5 * self.x3thm1)

        # orientation vectors -> TEME
        sinuk = math.sin(uk)
        cosuk = math.cos(uk)
        sinik = math.sin(xinck)
        cosik = math.cos(xinck)
        sinnok = math.sin(xnodek)
        cosnok = math.cos(xnodek)
        xmx = -sinnok * cosik
        xmy = cosnok * cosik
        ux = xmx * sinuk + cosnok * cosuk
        uy = xmy * sinuk + sinnok * cosuk
        uz = sinik * sinuk
        vx = xmx * cosuk - cosnok * sinuk
        vy = xmy * cosuk - sinnok * sinuk
        vz = sinik * cosuk

        pos = (rk * ux * XKMPER, rk * uy * XKMPER, rk * uz * XKMPER)
        vel_fac = XKMPER / 60.0
        vel = ((rdotk * ux + rfdotk * vx) * vel_fac,
               (rdotk * uy + rfdotk * vy) * vel_fac,
               (rdotk * uz + rfdotk * vz) * vel_fac)
        return pos, vel


def sgp4_ephemeris(line1: str, line2: str, times_s):
    """Sampled SGP4 positions (km) at the given times (seconds from
    epoch). Raises ValueError for deep-space TLEs (period >= 225 min) —
    callers fall back to the Keplerian+J2 oracle there."""
    import numpy as np

    prop = SGP4(elements_from_tle(line1, line2))
    if prop.is_deep_space:
        raise ValueError(
            f"deep-space TLE (period {prop.period_min:.1f} min >= 225): "
            "near-Earth SGP4 does not apply")
    return np.asarray([prop.propagate(t / 60.0)[0] for t in times_s])
