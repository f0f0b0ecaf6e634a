"""phaseII parity analysis — Spark-first transcription of the reference
module /root/reference/phaseII-analysis.py:297-512 (CMSPhase2SimTest).

Object definitions, the 5-step selection chain, all 61 Plot.make1D bookings
and the 6-entry CutFlowReport are reproduced with identical names, cuts and
binnings; execution is the single-pass histogrammer (SURVEY.md §4.2) instead
of an RDataFrame event loop.

The input DataFrame must have the hep_events schema (FIXTURES.md B.1):
elec/muon: array<struct<pt,eta,phi,mass,charge,isopass,idpass>>,
jetpuppi: array<struct<pt,eta,phi,mass,btag>>, metpuppi: struct<pt,phi>,
collections pT-descending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import collections as op
from ..plans.cutflow import CutFlowReport
from ..plans.plots import EquidistantBinning as EqB
from ..plans.plots import Plot
from ..plans.selection import Selection


def define_objects(df: DataFrame) -> DataFrame:
    """Materialize the shared object-selection chain as array columns —
    computed once per event, reused by every selection/plot (the reference
    shares them structurally in its expression DAG; here Catalyst reuses the
    named columns). phaseII-analysis.py:306-344."""
    elec = op.Collection(F.col("elec"))
    muon = op.Collection(F.col("muon"))
    jets = op.Collection(F.col("jetpuppi"))

    electrons = op.select(elec, lambda el: (el.pt > 20.0) & (F.abs(el.eta) < 2.5))
    muons = op.select(muon, lambda mu: (mu.pt > 20.0) & (F.abs(mu.eta) < 2.5))
    df = df.withColumn("electrons", electrons.col).withColumn("muons", muons.col)

    electrons = op.Collection(F.col("electrons"))
    muons = op.Collection(F.col("muons"))
    # cross-collection DeltaR cleaning: per-event correlated NOT EXISTS
    # (anti-join shape, SURVEY.md §2.3) — phaseII-analysis.py:314-325
    cleaned_el = op.select(
        electrons,
        lambda el: ~op.rng_any(muons, lambda mu: op.deltaR(el.p4, mu.p4) < 0.3),
    )
    cleaned_mu = op.select(
        muons,
        lambda mu: ~op.rng_any(electrons, lambda el: op.deltaR(mu.p4, el.p4) < 0.3),
    )
    # isopass/idpass bit 2 = medium working point (phaseII-analysis.py:318-329)
    ident_el = op.select(
        op.select(cleaned_el, lambda el: op.bit(el.isopass, 2)),
        lambda el: op.bit(el.idpass, 2),
    )
    ident_mu = op.select(
        op.select(cleaned_mu, lambda mu: op.bit(mu.isopass, 2)),
        lambda mu: op.bit(mu.idpass, 2),
    )
    df = df.withColumn("identifiedElectrons", ident_el.col).withColumn(
        "identifiedMuons", ident_mu.col
    )

    ident_el = op.Collection(F.col("identifiedElectrons"))
    ident_mu = op.Collection(F.col("identifiedMuons"))
    cleaned_jets = op.select(
        jets,
        lambda j: (
            ~op.rng_any(ident_el, lambda el: op.deltaR(el.p4, j.p4) < 0.3)
        )
        & (~op.rng_any(ident_mu, lambda mu: op.deltaR(mu.p4, j.p4) < 0.3)),
    )
    df = df.withColumn("cleanedJets", cleaned_jets.col)
    good_jets = op.select(
        op.Collection(F.col("cleanedJets")),
        lambda j: (j.pt > 30) & (F.abs(j.eta) < 2.5),
    )
    df = df.withColumn("cleanedGoodJets", good_jets.col)
    btagged = op.select(op.Collection(F.col("cleanedGoodJets")), lambda j: op.bit(j.btag, 2))
    df = df.withColumn("btaggedJets", btagged.col)
    # dimuon invariant mass of the two leading identified muons
    # (phaseII-analysis.py:331); NULL when fewer than 2 — guarded by sel1.
    inv = op.invariant_mass(ident_mu[0].p4, ident_mu[1].p4)
    # 6-decimal rounding before any consumer (Z-window cut, histogram
    # binning): the DuckDB oracle computes sinh via the exp identity
    # (<=1 ulp from JVM sinh), and an unrounded value within 1 ulp of a
    # strict threshold or bin edge would flip between engines. Physics
    # effect: none (the quantity is in GeV; 1e-6 is far below detector
    # resolution).
    return df.withColumn("InvMassMuMu", F.round(inv, 6))


def define_phase2(df: DataFrame):
    """Returns (df_with_objects, plots, cutflow, selections_by_name)."""
    df = define_objects(df)

    muons = op.Collection(F.col("muons"))
    ident_mu = op.Collection(F.col("identifiedMuons"))
    good_jets = op.Collection(F.col("cleanedGoodJets"))
    btagged = op.Collection(F.col("btaggedJets"))
    inv_mass = F.col("InvMassMuMu")
    met_pt = F.col("metpuppi")["pt"]

    no_sel = Selection.root("noSel")
    # selection1: >= 2 identified muons, leading two oppositely charged
    # (phaseII-analysis.py:349-350)
    sel1 = no_sel.refine(
        "nmumu",
        cut=(op.rng_len(ident_mu) > 1)
        & (op.product(ident_mu[0].charge, ident_mu[1].charge) < 0),
    )
    # selection2: Z-mass veto, strict open interval (phaseII-analysis.py:353)
    sel2 = sel1.refine("InvM", cut=~op.in_range(76, inv_mass, 106))
    # selection3: >= 2 cleaned good jets (phaseII-analysis.py:356)
    sel3 = sel2.refine("njet", cut=op.rng_len(good_jets) > 1)
    # selection4: at least one of the two leading jets b-tagged
    # (phaseII-analysis.py:359-360)
    sel4 = sel3.refine(
        "btag", cut=op.bit(good_jets[0].btag, 2) | op.bit(good_jets[1].btag, 2)
    )
    # selection5: MET > 40 GeV (phaseII-analysis.py:363)
    sel5 = sel4.refine("MET", cut=met_pt > 40)

    plots: list[Plot] = []
    ap = plots.append

    n_jets = op.rng_len(good_jets)
    n_btag = op.rng_len(btagged)
    n_mu = op.rng_len(ident_mu)

    # noSel block (phaseII-analysis.py:368-374)
    ap(Plot.make1D("nJetsNoSel", n_jets, no_sel, EqB(10, 0.0, 10.0), title="nJets"))
    ap(Plot.make1D("nbtaggedJetsNoSel", n_btag, no_sel, EqB(10, 0.0, 10.0), title="nbtaggedJets"))
    ap(Plot.make1D("nMuNoSel", n_mu, no_sel, EqB(15, 0.0, 15.0), title="nMuons"))
    ap(Plot.make1D("METptNoSel", met_pt, no_sel, EqB(50, 0.0, 250), title="MET_PT"))

    def lepton_block(suffix: str, sel: Selection, sub_pt_hi: float):
        ap(Plot.make1D(f"LeadingMuonPT{suffix}", muons[0].pt, sel, EqB(30, 0.0, 250.0)))
        ap(Plot.make1D(f"SubLeadingMuonPT{suffix}", muons[1].pt, sel, EqB(30, 0.0, sub_pt_hi)))
        ap(Plot.make1D(f"LeadingMuonEta{suffix}", muons[0].eta, sel, EqB(30, -3, 3)))
        ap(Plot.make1D(f"SubLeadingMuonEta{suffix}", muons[1].eta, sel, EqB(30, -3, 3)))

    # sel1 block (phaseII-analysis.py:378-394)
    ap(Plot.make1D("nJetsSel1", n_jets, sel1, EqB(10, 0.0, 10.0)))
    ap(Plot.make1D("nbtaggedJetsSel1", n_btag, sel1, EqB(10, 0.0, 10.0)))
    ap(Plot.make1D("nMuSel1", n_mu, sel1, EqB(10, 0.0, 10.0)))
    ap(Plot.make1D("InvMassTwoMuonsSel1", inv_mass, sel1, EqB(30, 0, 300)))
    lepton_block("Sel1", sel1, 250.0)
    ap(Plot.make1D("METptSel1", met_pt, sel1, EqB(50, 0.0, 250)))

    # sel2 block (phaseII-analysis.py:398-414)
    ap(Plot.make1D("nJetsSel2", n_jets, sel2, EqB(10, 0.0, 10.0)))
    ap(Plot.make1D("nbtaggedJetsSel2", n_btag, sel2, EqB(10, 0.0, 10.0)))
    ap(Plot.make1D("nMuSel2", n_mu, sel2, EqB(10, 0.0, 10.0)))
    ap(Plot.make1D("InvMassTwoMuonsSel2", inv_mass, sel2, EqB(20, 20.0, 300.0)))
    lepton_block("Sel2", sel2, 200.0)
    ap(Plot.make1D("METptSel2", met_pt, sel2, EqB(50, 0.0, 250)))

    def jet_block(suffix: str, sel: Selection, pt_hi: float):
        ap(Plot.make1D(f"LeadingJetPT{suffix}", good_jets[0].pt, sel, EqB(50, 0.0, pt_hi)))
        ap(Plot.make1D(f"SubLeadingJetPT{suffix}", good_jets[1].pt, sel, EqB(50, 0.0, pt_hi)))
        ap(Plot.make1D(f"LeadingJetEta{suffix}", good_jets[0].eta, sel, EqB(30, -3, 3.0)))
        ap(Plot.make1D(f"SubLeadingJetEta{suffix}", good_jets[1].eta, sel, EqB(30, -3, 3.0)))

    # sel3/sel4/sel5 blocks (phaseII-analysis.py:418-498): jet pT range is
    # 350 at sel3 and 250 at sel4/sel5, as written in the reference.
    for suffix, sel, jet_hi in (("Sel3", sel3, 350.0), ("Sel4", sel4, 250.0), ("Sel5", sel5, 250.0)):
        ap(Plot.make1D(f"nJets{suffix}", n_jets, sel, EqB(10, 0, 10)))
        ap(Plot.make1D(f"nbtaggedJets{suffix}", n_btag, sel, EqB(10, 0.0, 10.0)))
        jet_block(suffix, sel, jet_hi)
        ap(Plot.make1D(f"nMu{suffix}", n_mu, sel, EqB(10, 0.0, 10.0)))
        lepton_block(suffix, sel, 200.0)
        ap(Plot.make1D(f"InvMassTwoMuons{suffix}", inv_mass, sel, EqB(30, 0, 300)))
        ap(Plot.make1D(f"METpt{suffix}", met_pt, sel, EqB(50, 0.0, 250)))

    cfr = CutFlowReport("yields")
    cfr.add(no_sel, "Sel0: No selection")
    cfr.add(sel1, "Sel1: nMuMu >= 2")
    cfr.add(sel2, "Sel2: InvM")
    cfr.add(sel3, "Sel3: nJet >= 2")
    cfr.add(sel4, "Sel4: btag")
    cfr.add(sel5, "Sel5: MET")

    sels = {s.name: s for s in (no_sel, sel1, sel2, sel3, sel4, sel5)}
    return df, plots, cfr, sels
