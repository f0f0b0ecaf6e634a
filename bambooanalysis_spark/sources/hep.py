"""HEP event-fixture builder — FIXTURES.md §B.2 derivation.

Builds the ``hep_events`` table (one row per event, pT-descending
``array<struct>`` particle collections + MET struct — SURVEY.md §1.6 event
model) deterministically from the driver's seed-42 TPC-H-ish tables:

- one event per ``orders`` row (event_id = o_orderkey, weight = 1.0),
- each ``lineitem`` of the order becomes one physics object, routed by
  l_linenumber % 3 into elec / muon / jetpuppi,
- kinematics are pure deterministic column math (no RNG) so the DuckDB
  oracle can rebuild the identical fixture in SQL (``HEP_OBJECTS_SQL``).

Scale note: the build is ONE shuffle (groupBy event_id with conditional
collect_list per collection) followed by a broadcast-friendly join onto
orders. At 100 TB the same shape holds — the shuffle key is the natural
event key, collections stay bounded per event, and everything downstream is
shuffle-free per-row work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import collections as ops

PI = 3.141592653589793

# Deterministic kinematic transforms (FIXTURES.md B.2). Only IEEE-exact /
# correctly-rounded ops (+,-,*,/, integer modulo) so Spark and DuckDB agree
# bit-for-bit.
_PT = "l_extendedprice / 500.0"
_ETA = "greatest(-5.0, least(5.0, 5.0 * (2.0 * l_discount / 0.10 - 1.0)))"
_PHI = f"((l_partkey * 2654435761) % 6283185307) / 1e9 - {PI!r}"
_MASS = "CASE l_linenumber % 3 WHEN 0 THEN 0.000511 WHEN 1 THEN 0.1057 ELSE l_quantity END"
_CHARGE = "CASE WHEN l_suppkey % 2 = 0 THEN -1 ELSE 1 END"
_MASK = "CAST(l_partkey % 16 AS INT)"

# Identical text runs in Spark SQL and DuckDB: the relational "exploded"
# object view the oracle queries join against (FIXTURES.md B.3).
HEP_OBJECTS_SQL = f"""
SELECT l_orderkey AS event_id,
       CAST(l_linenumber % 3 AS INT) AS kind,
       {_PT} AS pt,
       {_ETA} AS eta,
       {_PHI} AS phi,
       {_MASS} AS mass,
       {_CHARGE} AS charge,
       {_MASK} AS isopass,
       {_MASK} AS idpass,
       {_MASK} AS btag
FROM lineitem
"""

HEP_EVENTS_SQL = """
SELECT o_orderkey AS event_id,
       1.0 AS weight,
       o_totalprice / 2000.0 AS met_pt,
       0.0 AS met_phi
FROM orders
"""

_LEPTON_FIELDS = ["pt", "eta", "phi", "mass", "charge", "isopass", "idpass"]
_JET_FIELDS = ["pt", "eta", "phi", "mass", "btag"]


def _obj_struct(fields: list[str]) -> Column:
    return F.struct(*[F.col(f).alias(f) for f in fields])


def build_hep_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hep_events DataFrame per FIXTURES.md B.1 schema:
    event_id, weight, elec, muon, jetpuppi (pT-descending arrays of structs),
    metpuppi struct<pt, phi>."""
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem.createOrReplaceTempView("lineitem")
    objects = spark.sql(HEP_OBJECTS_SQL)

    def coll(kind: int, fields: list[str]) -> Column:
        # collect_list skips NULLs -> collects only this kind's objects
        return F.collect_list(F.when(F.col("kind") == kind, _obj_struct(fields)))

    grouped = objects.groupBy("event_id").agg(
        coll(0, _LEPTON_FIELDS).alias("elec_raw"),
        coll(1, _LEPTON_FIELDS).alias("muon_raw"),
        coll(2, _JET_FIELDS).alias("jetpuppi_raw"),
    )

    events = orders.select(
        F.col("o_orderkey").alias("event_id"),
        F.lit(1.0).alias("weight"),
        F.struct(
            (F.col("o_totalprice") / F.lit(2000.0)).alias("pt"),
            F.lit(0.0).alias("phi"),
        ).alias("metpuppi"),
    )

    joined = events.join(grouped, "event_id", "left")
    empty_lep = F.array().cast(
        "array<struct<pt:double,eta:double,phi:double,mass:double,charge:int,isopass:int,idpass:int>>"
    )
    empty_jet = F.array().cast(
        "array<struct<pt:double,eta:double,phi:double,mass:double,btag:int>>"
    )
    # Enforce the pT-descending ordering invariant the reference assumes of
    # its input (SURVEY.md §2.8) with deterministic tie-breaks.
    return joined.select(
        "event_id",
        "weight",
        ops.sort_by_pt(F.coalesce(F.col("elec_raw"), empty_lep)).col.alias("elec"),
        ops.sort_by_pt(F.coalesce(F.col("muon_raw"), empty_lep)).col.alias("muon"),
        ops.sort_by_pt(F.coalesce(F.col("jetpuppi_raw"), empty_jet)).col.alias("jetpuppi"),
        "metpuppi",
    )
