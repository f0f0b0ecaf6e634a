"""jet_test parity analysis — Spark-first transcription of
/root/reference/jet_test.py:337-736 (CMSPhase2SimTest of the jet module).

Structure: the shared lepton-cleaning chain (identical to phaseII), then
cleaned jets sliced by 3 pT thresholds (30/50/100) x 4 eta regions
(all / 0to1_5 / 1_5to3 / 3toInf), a 52-node flat selection fan-out off
noSel (jet multiplicities 1..4 per slice, jet_test.py:416-518), 66 plots
(jet_test.py:524-724) and a 4-entry cutflow (jet_test.py:728-734).

NOTE the reference's "1_5to3" predicate is preserved AS WRITTEN
(jet_test.py:384-385): ``pt > X AND NOT(|eta| < 1.5 AND |eta| > 3)`` — the
inner conjunction is unsatisfiable, so NOT(...) is always true and the slice
degenerates to a pt-only cut. Parity means reproducing computed behavior,
not intent (SURVEY.md §7.2 item 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import collections as op
from ..plans.cutflow import CutFlowReport
from ..plans.plots import EquidistantBinning as EqB
from ..plans.plots import Plot
from ..plans.selection import Selection
from .phase2 import define_objects

_PTS = (30, 50, 100)
_REGIONS = ("0to1_5", "1_5to3", "3toInf")


def _region_pred(region: str | None, pt_cut: float):
    def pred(j):
        base = j.pt > pt_cut
        if region is None:
            return base
        aeta = F.abs(j.eta)
        if region == "0to1_5":
            return base & (aeta < 1.5)
        if region == "1_5to3":
            # preserved as written: NOT(|eta|<1.5 AND |eta|>3) == always true
            return base & (~((aeta < 1.5) & (aeta > 3)))
        return base & (aeta > 3)

    return pred


def define_jet_test(df: DataFrame):
    """Returns (df_with_objects, plots, cutflow, selections_by_name)."""
    df = define_objects(df)  # same cleaning chain, jet_test.py:345-379

    cleaned = op.Collection(F.col("cleanedJets"))
    colls: dict[tuple[int, str | None], str] = {}
    for pt in _PTS:
        for region in (None, *_REGIONS):
            name = f"cleanedGoodJets{pt}" + (f"_{region}" if region else "")
            df = df.withColumn(name, op.select(cleaned, _region_pred(region, float(pt))).col)
            colls[(pt, region)] = name

    def coll(pt: int, region: str | None) -> op.Collection:
        return op.Collection(F.col(colls[(pt, region)]))

    no_sel = Selection.root("noSel")
    sels: dict[str, Selection] = {"noSel": no_sel}

    # sel1/sel2/sel3: >=1 jet above threshold (jet_test.py:416-418) — used
    # by the MET plots and the cutflow.
    for pt in _PTS:
        sels[f"nJet{pt}"] = no_sel.refine(f"nJet{pt}", cut=op.rng_len(coll(pt, None)) > 0)
    # 48-node fan-out: nJet{pt}_{k} (count > k-1) and nJet{pt}_{k}_{r}
    # per eta region (jet_test.py:420-518) — all refined from noSel.
    for pt in _PTS:
        for k in (1, 2, 3, 4):
            sels[f"nJet{pt}_{k}"] = no_sel.refine(
                f"nJet{pt}_{k}", cut=op.rng_len(coll(pt, None)) > k - 1
            )
            for ridx, region in enumerate(_REGIONS, start=1):
                sels[f"nJet{pt}_{k}_{ridx}"] = no_sel.refine(
                    f"nJet{pt}_{k}_{ridx}", cut=op.rng_len(coll(pt, region)) > k - 1
                )

    plots: list[Plot] = []
    ap = plots.append

    # Binning upper edges per (jet index k, axis) — from jet_test.py:524-724.
    pt_hi_full = {1: 4000.0, 2: 4000.0, 3: 2000.0, 4: 2000.0}
    pt_hi_3toinf = {1: 1000.0, 2: 500.0, 3: 200.0, 4: 200.0}

    for pt in _PTS:
        ap(
            Plot.make1D(
                f"nJets_jetPT_{pt}GeV",
                op.rng_len(coll(pt, None)),
                no_sel,
                EqB(15, 0.0, 15.0),
                title=f"nJets (jet p_T > {pt}GeV)",
            )
        )
        for k in (1, 2, 3, 4):
            full = coll(pt, None)
            ap(
                Plot.make1D(
                    f"Jet{k}_pT_jetPT_{pt}GeV",
                    full[k - 1].pt,
                    sels[f"nJet{pt}_{k}"],
                    EqB(50, 0.0, pt_hi_full[k]),
                )
            )
            ap(
                Plot.make1D(
                    f"Jet{k}_eta_jetPT_{pt}GeV",
                    full[k - 1].eta,
                    sels[f"nJet{pt}_{k}"],
                    EqB(30, -3, 3),
                )
            )
            for ridx, region in enumerate(_REGIONS, start=1):
                hi = pt_hi_3toinf[k] if region == "3toInf" else pt_hi_full[k]
                ap(
                    Plot.make1D(
                        f"Jet{k}_pT_{region}_jetPT_{pt}GeV",
                        coll(pt, region)[k - 1].pt,
                        sels[f"nJet{pt}_{k}_{ridx}"],
                        EqB(50, 0, hi),
                    )
                )
        ap(
            Plot.make1D(
                f"MET_jetPT_{pt}GeV",
                F.col("metpuppi")["pt"],
                sels[f"nJet{pt}"],
                EqB(50, 0, 1000),
            )
        )

    cfr = CutFlowReport("yields")
    cfr.add(no_sel, "None")
    cfr.add(sels["nJet30"], "30GeV")
    cfr.add(sels["nJet50"], "50GeV")
    cfr.add(sels["nJet100"], "100GeV")

    return df, plots, cfr, sels
