"""Physics column-expression functions.

Semantics match the reference's operator vocabulary (SURVEY.md §2.4; usage at
/root/reference/phaseII-analysis.py:315,324,331,334-335,353):

- ``delta_phi``: signed angular difference wrapped to [-pi, pi]
- ``delta_r``:   sqrt(deta^2 + dphi^2) with wrapped dphi
- ``invariant_mass``: two-body invariant mass from (pt, eta, phi, mass) pairs
- ``bit_set``:   the reference's ``x & (1<<k)`` truthiness (Spark needs != 0)
- ``in_range_open``: the reference's strict open interval ``lo < x < hi``

Everything here is a pure Column expression — JVM-side, whole-stage-codegen
friendly, no Python UDFs. ``delta_phi`` deliberately avoids trig
(``atan2(sin, cos)``) in favor of an exact floor-based wrap: add/sub/mul/div
and floor are IEEE-exact / correctly rounded, so results are bit-reproducible
across engines (important for DuckDB-oracle equality checks) and cheaper.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_PI = math.pi
_TWO_PI = 2.0 * math.pi


def _as_col(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def delta_phi(phi1, phi2) -> Column:
    """Wrapped phi1 - phi2 in [-pi, pi] (trig-free, exact wrap)."""
    d = _as_col(phi1) - _as_col(phi2)
    return d - F.lit(_TWO_PI) * F.floor((d + F.lit(_PI)) / F.lit(_TWO_PI))


def delta_r(eta1, phi1, eta2, phi2) -> Column:
    """Angular distance sqrt(deta^2 + dphi^2), dphi wrapped to [-pi, pi]."""
    deta = _as_col(eta1) - _as_col(eta2)
    dphi = delta_phi(phi1, phi2)
    return F.sqrt(deta * deta + dphi * dphi)


def invariant_mass(pt1, eta1, phi1, m1, pt2, eta2, phi2, m2) -> Column:
    """Two-body invariant mass from (pt, eta, phi, mass) components.

    px = pt cos(phi), py = pt sin(phi), pz = pt sinh(eta),
    E = sqrt(pt^2 + pz^2 + m^2);  M = sqrt((E1+E2)^2 - |p1+p2|^2),
    clamped at 0 against tiny negative round-off.
    """
    pt1, eta1, phi1, m1 = map(_as_col, (pt1, eta1, phi1, m1))
    pt2, eta2, phi2, m2 = map(_as_col, (pt2, eta2, phi2, m2))
    px1, py1, pz1 = pt1 * F.cos(phi1), pt1 * F.sin(phi1), pt1 * F.sinh(eta1)
    px2, py2, pz2 = pt2 * F.cos(phi2), pt2 * F.sin(phi2), pt2 * F.sinh(eta2)
    e1 = F.sqrt(pt1 * pt1 + pz1 * pz1 + m1 * m1)
    e2 = F.sqrt(pt2 * pt2 + pz2 * pz2 + m2 * m2)
    esum = e1 + e2
    px, py, pz = px1 + px2, py1 + py2, pz1 + pz2
    m2val = esum * esum - (px * px + py * py + pz * pz)
    # clamp tiny negative round-off at 0 while PRESERVING NULL inputs:
    # F.greatest would skip NULLs and turn missing objects into mass 0.0
    return F.sqrt(F.when(m2val < 0.0, F.lit(0.0)).otherwise(m2val))


def invariant_mass_p4(p4a, p4b) -> Column:
    """invariant_mass over two struct columns with pt/eta/phi/mass fields."""
    return invariant_mass(
        p4a["pt"], p4a["eta"], p4a["phi"], p4a["mass"],
        p4b["pt"], p4b["eta"], p4b["phi"], p4b["mass"],
    )


def bit_set(x, k: int) -> Column:
    """True iff bit ``k`` of integer column ``x`` is set.

    The reference writes ``x & (1<<2)`` and relies on C++ int truthiness
    (phaseII-analysis.py:319); Spark booleans need the explicit ``!= 0``.
    """
    return _as_col(x).bitwiseAND(F.lit(1 << k)) != 0


def in_range_open(lo, x, hi) -> Column:
    """Strict open-interval test lo < x < hi (NOT ``between``, which is
    inclusive) — matches the reference's Z-veto usage
    (phaseII-analysis.py:353)."""
    xc = _as_col(x)
    return (xc > _as_col(lo)) & (xc < _as_col(hi))
