"""HEP reference-parity queries for the driver's DuckDB-oracle gate.

Spark side: the engine's real APIs (build_hep_events -> op.* -> Selection
DAG -> single-pass histogrammer). Oracle side: the exploded relational
equivalent (FIXTURES.md B.3) — objects as rows, within-event ops as
correlated EXISTS / NOT EXISTS / window functions over event_id.

Determinism: all kinematic math uses IEEE-exact or correctly-rounded ops
(+,-,*,/, floor, sqrt) so Spark (JVM) and DuckDB agree bit-for-bit; the one
trig-bearing quantity (invariant mass) is rounded to 6 decimals on BOTH
sides before comparison/binning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.hep import HEP_OBJECTS_SQL
from . import register

_PI = repr(math.pi)
_2PI = repr(2.0 * math.pi)

# deterministic tie-break chain matching ops.sort_by_pt
_ORDER = "pt DESC, phi, eta, mass"


def _dphi(a: str, b: str) -> str:
    d = f"({a}.phi - {b}.phi)"
    return f"({d} - {_2PI} * floor(({d} + {_PI}) / {_2PI}))"


def _dr(a: str, b: str) -> str:
    de = f"({a}.eta - {b}.eta)"
    dp = _dphi(a, b)
    return f"sqrt({de} * {de} + {dp} * {dp})"


def _invmass(a: str, b: str) -> str:
    """Two-body invariant mass over aliased object rows (pt/eta/phi/mass)."""
    terms = {}
    for t in (a, b):
        terms[t] = dict(
            px=f"({t}.pt * cos({t}.phi))",
            py=f"({t}.pt * sin({t}.phi))",
            # DuckDB has no sinh(); the exp identity differs from JVM sinh
            # by <= ~1 ulp, which inv-mass consumers absorb (open-interval
            # thresholds / 6-decimal rounding)
            pz=f"({t}.pt * ((exp({t}.eta) - exp(-{t}.eta)) / 2.0))",
        )
        terms[t]["e"] = (
            f"sqrt({t}.pt * {t}.pt + {terms[t]['pz']} * {terms[t]['pz']}"
            f" + {t}.mass * {t}.mass)"
        )
    e = f"({terms[a]['e']} + {terms[b]['e']})"
    px = f"({terms[a]['px']} + {terms[b]['px']})"
    py = f"({terms[a]['py']} + {terms[b]['py']})"
    pz = f"({terms[a]['pz']} + {terms[b]['pz']})"
    return f"sqrt(greatest({e} * {e} - {px} * {px} - {py} * {py} - {pz} * {pz}, 0.0))"


# The full phaseII object chain (phaseII-analysis.py:306-344) as relational
# CTEs. Unused CTEs are pruned by DuckDB's optimizer, so every hep oracle
# shares this prefix.
CHAIN_CTES = f"""
WITH objs AS ({HEP_OBJECTS_SQL}),
ev AS (
    SELECT o_orderkey AS event_id, o_totalprice / 2000.0 AS met
    FROM orders
),
electrons AS (
    SELECT * FROM objs WHERE kind = 0 AND pt > 20.0 AND abs(eta) < 2.5
),
muons AS (
    SELECT * FROM objs WHERE kind = 1 AND pt > 20.0 AND abs(eta) < 2.5
),
cleaned_el AS (
    SELECT e.* FROM electrons e
    WHERE NOT EXISTS (
        SELECT 1 FROM muons m
        WHERE m.event_id = e.event_id AND {_dr('e', 'm')} < 0.3
    )
),
cleaned_mu AS (
    SELECT m.* FROM muons m
    WHERE NOT EXISTS (
        SELECT 1 FROM electrons e
        WHERE e.event_id = m.event_id AND {_dr('m', 'e')} < 0.3
    )
),
ident_el AS (
    SELECT * FROM cleaned_el WHERE (isopass & 4) <> 0 AND (idpass & 4) <> 0
),
ident_mu AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY {_ORDER}) AS rn
    FROM cleaned_mu WHERE (isopass & 4) <> 0 AND (idpass & 4) <> 0
),
cleaned_jets AS (
    SELECT j.* FROM objs j
    WHERE j.kind = 2
      AND NOT EXISTS (
        SELECT 1 FROM ident_el e
        WHERE e.event_id = j.event_id AND {_dr('e', 'j')} < 0.3
      )
      AND NOT EXISTS (
        SELECT 1 FROM ident_mu m
        WHERE m.event_id = j.event_id AND {_dr('m', 'j')} < 0.3
      )
),
good_jets AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY {_ORDER}) AS rn
    FROM cleaned_jets WHERE pt > 30 AND abs(eta) < 2.5
),
mu_pair AS (
    SELECT a.event_id,
           a.charge AS q1, b.charge AS q2,
           {_invmass('a', 'b')} AS inv_mass
    FROM ident_mu a JOIN ident_mu b
      ON a.event_id = b.event_id AND a.rn = 1 AND b.rn = 2
),
per_event AS (
    SELECT ev.event_id,
           ev.met,
           COALESCE(nm.n_mu, 0) AS n_mu,
           COALESCE(gj.n_jets, 0) AS n_jets,
           mp.q1, mp.q2, mp.inv_mass,
           j1.btag AS jet1_btag, j2.btag AS jet2_btag
    FROM ev
    LEFT JOIN (SELECT event_id, COUNT(*) AS n_mu FROM ident_mu GROUP BY 1) nm
           ON nm.event_id = ev.event_id
    LEFT JOIN (SELECT event_id, COUNT(*) AS n_jets FROM good_jets GROUP BY 1) gj
           ON gj.event_id = ev.event_id
    LEFT JOIN mu_pair mp ON mp.event_id = ev.event_id
    LEFT JOIN (SELECT * FROM good_jets WHERE rn = 1) j1 ON j1.event_id = ev.event_id
    LEFT JOIN (SELECT * FROM good_jets WHERE rn = 2) j2 ON j2.event_id = ev.event_id
),
flags AS (
    SELECT event_id, met, n_mu, n_jets, inv_mass,
           COALESCE(n_mu >= 2 AND q1 * q2 < 0, FALSE) AS pass1,
           COALESCE(n_mu >= 2 AND q1 * q2 < 0
                    AND NOT (inv_mass > 76 AND inv_mass < 106), FALSE) AS pass2,
           COALESCE(n_mu >= 2 AND q1 * q2 < 0
                    AND NOT (inv_mass > 76 AND inv_mass < 106)
                    AND n_jets >= 2, FALSE) AS pass3,
           COALESCE(n_mu >= 2 AND q1 * q2 < 0
                    AND NOT (inv_mass > 76 AND inv_mass < 106)
                    AND n_jets >= 2
                    AND ((jet1_btag & 4) <> 0 OR (jet2_btag & 4) <> 0), FALSE) AS pass4,
           COALESCE(n_mu >= 2 AND q1 * q2 < 0
                    AND NOT (inv_mass > 76 AND inv_mass < 106)
                    AND n_jets >= 2
                    AND ((jet1_btag & 4) <> 0 OR (jet2_btag & 4) <> 0)
                    AND met > 40, FALSE) AS pass5
    FROM per_event
)
"""


def _hep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import build_hep_events

    return build_hep_events(spark, sf_dir)


# --- op.select + op.rng_len: within-event filter and count ------------------

def q_select_rng_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import collections as op

    hep = _hep(spark, sf_dir)
    elec = op.Collection(F.col("elec"))
    muon = op.Collection(F.col("muon"))
    jets = op.Collection(F.col("jetpuppi"))
    return hep.select(
        F.col("event_id"),
        op.rng_len(op.select(elec, lambda o: (o.pt > 20.0) & (F.abs(o.eta) < 2.5)))
        .cast("long")
        .alias("n_elec"),
        op.rng_len(op.select(muon, lambda o: (o.pt > 20.0) & (F.abs(o.eta) < 2.5)))
        .cast("long")
        .alias("n_muon"),
        op.rng_len(op.select(jets, lambda o: (o.pt > 30.0) & (F.abs(o.eta) < 2.5)))
        .cast("long")
        .alias("n_jet"),
    )


ORACLE_SELECT_RNG_LEN = f"""
WITH objs AS ({HEP_OBJECTS_SQL})
SELECT o.o_orderkey AS event_id,
       COUNT(*) FILTER (WHERE kind = 0 AND pt > 20.0 AND abs(eta) < 2.5) AS n_elec,
       COUNT(*) FILTER (WHERE kind = 1 AND pt > 20.0 AND abs(eta) < 2.5) AS n_muon,
       COUNT(*) FILTER (WHERE kind = 2 AND pt > 30.0 AND abs(eta) < 2.5) AS n_jet
FROM orders o LEFT JOIN objs ON objs.event_id = o.o_orderkey
GROUP BY 1
"""


# --- cross-collection DeltaR cleaning: correlated NOT EXISTS ----------------

def q_cleaned_jets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..analyses.phase2 import define_objects

    df = define_objects(_hep(spark, sf_dir))
    return df.select(
        "event_id",
        F.size("cleanedJets").cast("long").alias("n_cleaned_jets"),
        F.size("identifiedMuons").cast("long").alias("n_ident_mu"),
        F.size("identifiedElectrons").cast("long").alias("n_ident_el"),
    )


ORACLE_CLEANED_JETS = f"""{CHAIN_CTES}
SELECT ev.event_id,
       COALESCE(cj.n, 0) AS n_cleaned_jets,
       COALESCE(im.n, 0) AS n_ident_mu,
       COALESCE(ie.n, 0) AS n_ident_el
FROM ev
LEFT JOIN (SELECT event_id, COUNT(*) AS n FROM cleaned_jets GROUP BY 1) cj
       ON cj.event_id = ev.event_id
LEFT JOIN (SELECT event_id, COUNT(*) AS n FROM ident_mu GROUP BY 1) im
       ON im.event_id = ev.event_id
LEFT JOIN (SELECT event_id, COUNT(*) AS n FROM ident_el GROUP BY 1) ie
       ON ie.event_id = ev.event_id
"""


# --- histogram (Plot.make1D + EquidistantBinning): METptNoSel ---------------

def q_histogram_met(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans import EquidistantBinning, Plot, Selection, run_analysis

    hep = _hep(spark, sf_dir)
    root = Selection.root()
    hist = run_analysis(
        hep,
        [Plot.make1D("METptNoSel", F.col("metpuppi")["pt"], root, EquidistantBinning(50, 0.0, 250.0))],
    )
    return hist.select(
        F.col("bin"),
        F.col("sumw"),
        F.col("n").alias("n_entries"),
    )


ORACLE_HISTOGRAM_MET = """
WITH met AS (SELECT o_totalprice / 2000.0 AS x FROM orders)
SELECT CASE WHEN x < 0.0 THEN -1
            WHEN x >= 250.0 THEN 50
            ELSE LEAST(CAST(FLOOR(x / 5.0) AS INT), 49) END AS bin,
       SUM(1.0) AS sumw,
       COUNT(*) AS n_entries
FROM met
GROUP BY 1
"""


# --- the flagship: full phaseII cutflow (Selection DAG, 6 nodes) ------------

_PHASE2_ORDER = ["noSel", "nmumu", "InvM", "njet", "btag", "MET"]


def q_cutflow_phase2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..analyses import define_phase2
    from ..plans import run_analysis
    from ..plans.histogrammer import cutflow_table

    df, plots, cfr, _sels = define_phase2(_hep(spark, sf_dir))
    hist = run_analysis(df, plots, [cfr])
    cf = cutflow_table(hist, "yields", _PHASE2_ORDER)
    return cf.select("selection", "seq", "num_events", "sum_weights")


ORACLE_CUTFLOW_PHASE2 = f"""{CHAIN_CTES}
SELECT s.selection, s.seq, c.num_events, CAST(c.num_events AS DOUBLE) AS sum_weights
FROM (VALUES ('noSel', 0), ('nmumu', 1), ('InvM', 2), ('njet', 3), ('btag', 4), ('MET', 5))
     AS s(selection, seq)
JOIN (
    SELECT 0 AS seq, COUNT(*) AS num_events FROM flags
    UNION ALL SELECT 1, COUNT(*) FILTER (WHERE pass1) FROM flags
    UNION ALL SELECT 2, COUNT(*) FILTER (WHERE pass2) FROM flags
    UNION ALL SELECT 3, COUNT(*) FILTER (WHERE pass3) FROM flags
    UNION ALL SELECT 4, COUNT(*) FILTER (WHERE pass4) FROM flags
    UNION ALL SELECT 5, COUNT(*) FILTER (WHERE pass5) FROM flags
) c ON c.seq = s.seq
WHERE c.num_events > 0
"""


register("hep_select_rng_len", q_select_rng_len, ORACLE_SELECT_RNG_LEN)
register("hep_cleaned_jets_not_exists", q_cleaned_jets, ORACLE_CLEANED_JETS)
register("hep_histogram_met", q_histogram_met, ORACLE_HISTOGRAM_MET)
register("hep_cutflow_phase2", q_cutflow_phase2, ORACLE_CUTFLOW_PHASE2)
