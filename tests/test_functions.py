"""Unit tests for the physics column functions against hand-computed /
numpy-computed values (SURVEY.md §7.2 step 1)."""

import math

import pytest
from pyspark.sql import functions as F

from bambooanalysis_spark.functions import (
    bit_set,
    delta_phi,
    delta_r,
    in_range_open,
    invariant_mass,
)


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_delta_phi_wraps(spark):
    # 0.1 - (2pi - 0.1) = 0.2 - 2pi -> wraps to 0.2
    got = _eval(spark, delta_phi(F.lit(0.1), F.lit(2 * math.pi - 0.1)))
    assert got == pytest.approx(0.2, abs=1e-12)
    got = _eval(spark, delta_phi(F.lit(-3.0), F.lit(3.0)))
    assert got == pytest.approx(2 * math.pi - 6.0, abs=1e-12)
    # no wrap needed
    assert _eval(spark, delta_phi(F.lit(1.0), F.lit(0.25))) == pytest.approx(0.75)


def test_delta_r(spark):
    # deta=0.3, dphi wraps across the -pi/pi seam to 0.4
    phi1, phi2 = math.pi - 0.2, -math.pi + 0.2
    got = _eval(spark, delta_r(F.lit(1.0), F.lit(phi1), F.lit(0.7), F.lit(phi2)))
    assert got == pytest.approx(math.hypot(0.3, 0.4), abs=1e-12)


def test_invariant_mass_z_like(spark):
    # two massless back-to-back particles: M = 2*pt
    got = _eval(
        spark,
        invariant_mass(
            F.lit(45.0), F.lit(0.0), F.lit(0.0), F.lit(0.0),
            F.lit(45.0), F.lit(0.0), F.lit(math.pi), F.lit(0.0),
        ),
    )
    assert got == pytest.approx(90.0, rel=1e-12)


def test_invariant_mass_numpy_reference(spark):
    import numpy as np

    pt1, eta1, phi1, m1 = 55.3, 1.2, 0.4, 0.1057
    pt2, eta2, phi2, m2 = 33.1, -0.8, -2.9, 0.1057
    px = pt1 * np.cos(phi1) + pt2 * np.cos(phi2)
    py = pt1 * np.sin(phi1) + pt2 * np.sin(phi2)
    pz = pt1 * np.sinh(eta1) + pt2 * np.sinh(eta2)
    e = np.sqrt(pt1**2 + (pt1 * np.sinh(eta1)) ** 2 + m1**2) + np.sqrt(
        pt2**2 + (pt2 * np.sinh(eta2)) ** 2 + m2**2
    )
    expect = float(np.sqrt(e**2 - px**2 - py**2 - pz**2))
    got = _eval(
        spark,
        invariant_mass(
            F.lit(pt1), F.lit(eta1), F.lit(phi1), F.lit(m1),
            F.lit(pt2), F.lit(eta2), F.lit(phi2), F.lit(m2),
        ),
    )
    assert got == pytest.approx(expect, rel=1e-12)


def test_bit_set(spark):
    # the reference's medium working point: bit 2 (phaseII-analysis.py:318)
    assert _eval(spark, bit_set(F.lit(4), 2)) is True
    assert _eval(spark, bit_set(F.lit(3), 2)) is False
    assert _eval(spark, bit_set(F.lit(15), 2)) is True


def test_in_range_open_strict(spark):
    assert _eval(spark, in_range_open(76, F.lit(76.0), 106)) is False  # strict
    assert _eval(spark, in_range_open(76, F.lit(106.0), 106)) is False
    assert _eval(spark, in_range_open(76, F.lit(90.0), 106)) is True


def test_strip_html(spark):
    from pyspark.sql import Row

    from bambooanalysis_spark.operators.text import strip_html

    cases = [
        ("<p>hello <b>world</b></p>", "hello world"),
        ("<script>var a = '<p>';</script>text", "text"),
        ("<style>p{color:red}</style>a<br/>b", "a b"),
        ("x &amp; y &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;z",
         "x & y <tag> \"q\" 's' z"),
        ("no markup at all", "no markup at all"),
        ("<div class=\"a\" data-x='<'>inner</div>", "inner"),
        ("a\n\n  b\t c", "a b c"),
    ]
    df = spark.createDataFrame([Row(i=i, t=t) for i, (t, _e) in enumerate(cases)])
    got = {r["i"]: r["s"] for r in df.select("i", strip_html(F.col("t")).alias("s")).collect()}
    for i, (_t, expect) in enumerate(cases):
        assert got[i] == expect, (i, got[i])
