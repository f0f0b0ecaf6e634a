"""Pure numpy/pandas reimplementation of the HEP fixture (FIXTURES.md B.2)
and the phaseII analysis chain — the independent golden-output oracle for
the Spark engine (SURVEY.md §5 test plan).

Deliberately written row-at-a-time over python dicts: slow but obviously
correct and structurally unrelated to the Spark implementation.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

PI = 3.141592653589793
TWO_PI = 2.0 * PI


def load_events(sf_dir: str) -> dict[int, dict]:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    events: dict[int, dict] = {}
    for okey, tot in zip(orders["o_orderkey"], orders["o_totalprice"]):
        events[int(okey)] = {"elec": [], "muon": [], "jet": [], "met": float(tot) / 2000.0}
    for r in li.itertuples(index=False):
        kind = int(r.l_linenumber) % 3
        pt = float(r.l_extendedprice) / 500.0
        eta = min(5.0, max(-5.0, 5.0 * (2.0 * float(r.l_discount) / 0.10 - 1.0)))
        phi = ((int(r.l_partkey) * 2654435761) % 6283185307) / 1e9 - PI
        mass = [0.000511, 0.1057, float(r.l_quantity)][kind]
        charge = -1 if int(r.l_suppkey) % 2 == 0 else 1
        mask = int(r.l_partkey) % 16
        obj = {
            "pt": pt, "eta": eta, "phi": phi, "mass": mass,
            "charge": charge, "isopass": mask, "idpass": mask, "btag": mask,
        }
        events[int(r.l_orderkey)][["elec", "muon", "jet"][kind]].append(obj)
    for ev in events.values():
        for k in ("elec", "muon", "jet"):
            ev[k].sort(key=lambda o: (-o["pt"], o["phi"], o["eta"], o["mass"]))
    return events


def delta_phi(a: float, b: float) -> float:
    d = a - b
    return d - TWO_PI * math.floor((d + PI) / TWO_PI)


def delta_r(o1: dict, o2: dict) -> float:
    de = o1["eta"] - o2["eta"]
    dp = delta_phi(o1["phi"], o2["phi"])
    return math.sqrt(de * de + dp * dp)


def invariant_mass(o1: dict, o2: dict) -> float:
    def p4(o):
        px = o["pt"] * math.cos(o["phi"])
        py = o["pt"] * math.sin(o["phi"])
        pz = o["pt"] * math.sinh(o["eta"])
        e = math.sqrt(o["pt"] ** 2 + pz**2 + o["mass"] ** 2)
        return px, py, pz, e

    px1, py1, pz1, e1 = p4(o1)
    px2, py2, pz2, e2 = p4(o2)
    m2 = (e1 + e2) ** 2 - (px1 + px2) ** 2 - (py1 + py2) ** 2 - (pz1 + pz2) ** 2
    return math.sqrt(max(m2, 0.0))


def bit2(x: int) -> bool:
    return (x & 4) != 0


def phase2_objects(ev: dict) -> dict:
    electrons = [o for o in ev["elec"] if o["pt"] > 20.0 and abs(o["eta"]) < 2.5]
    muons = [o for o in ev["muon"] if o["pt"] > 20.0 and abs(o["eta"]) < 2.5]
    cleaned_el = [
        e for e in electrons if not any(delta_r(e, m) < 0.3 for m in muons)
    ]
    cleaned_mu = [
        m for m in muons if not any(delta_r(m, e) < 0.3 for e in electrons)
    ]
    ident_el = [e for e in cleaned_el if bit2(e["isopass"]) and bit2(e["idpass"])]
    ident_mu = [m for m in cleaned_mu if bit2(m["isopass"]) and bit2(m["idpass"])]
    cleaned_jets = [
        j
        for j in ev["jet"]
        if not any(delta_r(e, j) < 0.3 for e in ident_el)
        and not any(delta_r(m, j) < 0.3 for m in ident_mu)
    ]
    good_jets = [j for j in cleaned_jets if j["pt"] > 30 and abs(j["eta"]) < 2.5]
    btagged = [j for j in good_jets if bit2(j["btag"])]
    return {
        "muons": muons,
        "ident_mu": ident_mu,
        "good_jets": good_jets,
        "btagged": btagged,
        "cleaned_jets": cleaned_jets,
        "met": ev["met"],
    }


def phase2_cutflow_and_masses(events: dict[int, dict]):
    """Returns (counts per selection node, InvMass values of events passing
    sel1) — the reference chain phaseII-analysis.py:349-363."""
    counts = {"noSel": 0, "nmumu": 0, "InvM": 0, "njet": 0, "btag": 0, "MET": 0}
    inv_sel1: list[float] = []
    for ev in events.values():
        counts["noSel"] += 1
        o = phase2_objects(ev)
        mu = o["ident_mu"]
        if not (len(mu) > 1 and mu[0]["charge"] * mu[1]["charge"] < 0):
            continue
        counts["nmumu"] += 1
        m = invariant_mass(mu[0], mu[1])
        inv_sel1.append(m)
        if 76 < m < 106:
            continue
        counts["InvM"] += 1
        gj = o["good_jets"]
        if not len(gj) > 1:
            continue
        counts["njet"] += 1
        if not (bit2(gj[0]["btag"]) or bit2(gj[1]["btag"])):
            continue
        counts["btag"] += 1
        if not o["met"] > 40:
            continue
        counts["MET"] += 1
    return counts, inv_sel1


def jet_test_cutflow(events: dict[int, dict]):
    """jet_test.py:728-734 cutflow: >=1 cleaned jet above 30/50/100 GeV."""
    counts = {"noSel": 0, "nJet30": 0, "nJet50": 0, "nJet100": 0}
    for ev in events.values():
        counts["noSel"] += 1
        cj = phase2_objects(ev)["cleaned_jets"]
        for thr in (30, 50, 100):
            if any(j["pt"] > thr for j in cj):
                counts[f"nJet{thr}"] += 1
    return counts


def histogram_eqb(values, n, lo, hi):
    """Reference binning: -1 underflow, 0..n-1 in-range, n overflow."""
    out = {}
    w = (hi - lo) / n
    for v in values:
        if v < lo:
            b = -1
        elif v >= hi:
            b = n
        else:
            b = min(int(math.floor((v - lo) / w)), n - 1)
        out[b] = out.get(b, 0) + 1
    return out


def jet_test_collections(ev: dict) -> dict:
    """jet_test.py:379-414 jet slices over cleaned jets (reference preserves
    the degenerate 1_5to3 predicate => pt-only)."""
    cj = phase2_objects(ev)["cleaned_jets"]
    out = {}
    for pt in (30, 50, 100):
        out[(pt, None)] = [j for j in cj if j["pt"] > pt]
        out[(pt, "0to1_5")] = [j for j in cj if j["pt"] > pt and abs(j["eta"]) < 1.5]
        out[(pt, "1_5to3")] = [j for j in cj if j["pt"] > pt]  # as written
        out[(pt, "3toInf")] = [j for j in cj if j["pt"] > pt and abs(j["eta"]) > 3]
    return out


def jet_test_histograms(events: dict[int, dict]):
    """Golden values for three representative jet_test plots."""
    njets30 = []
    jet1_pt30 = []  # under sel nJet30_1 (>=1 jet30)
    jet2_eta50 = []  # under sel nJet50_2 (>=2 jet50)
    for ev in events.values():
        colls = jet_test_collections(ev)
        j30 = colls[(30, None)]
        j50 = colls[(50, None)]
        njets30.append(len(j30))
        if len(j30) > 0:
            jet1_pt30.append(j30[0]["pt"])
        if len(j50) > 1:
            jet2_eta50.append(j50[1]["eta"])
    return {
        "nJets_jetPT_30GeV": histogram_eqb(njets30, 15, 0.0, 15.0),
        "Jet1_pT_jetPT_30GeV": histogram_eqb(jet1_pt30, 50, 0.0, 4000.0),
        "Jet2_eta_jetPT_50GeV": histogram_eqb(jet2_eta50, 30, -3.0, 3.0),
    }


def jet_test_all_histograms(events: dict[int, dict]):
    """Golden values for ALL 66 jet_test plots (jet_test.py:524-724):
    per-threshold jet counts, per-index pT/eta under the >=k selections,
    per-region pT slices, and MET under the >=1 selections."""
    pt_hi_full = {1: 4000.0, 2: 4000.0, 3: 2000.0, 4: 2000.0}
    pt_hi_3toinf = {1: 1000.0, 2: 500.0, 3: 200.0, 4: 200.0}
    regions = ("0to1_5", "1_5to3", "3toInf")

    spec: dict[str, tuple[int, float, float]] = {}
    vals: dict[str, list] = {}
    for pt in (30, 50, 100):
        spec[f"nJets_jetPT_{pt}GeV"] = (15, 0.0, 15.0)
        spec[f"MET_jetPT_{pt}GeV"] = (50, 0.0, 1000.0)
        for k in (1, 2, 3, 4):
            spec[f"Jet{k}_pT_jetPT_{pt}GeV"] = (50, 0.0, pt_hi_full[k])
            spec[f"Jet{k}_eta_jetPT_{pt}GeV"] = (30, -3.0, 3.0)
            for region in regions:
                hi = pt_hi_3toinf[k] if region == "3toInf" else pt_hi_full[k]
                spec[f"Jet{k}_pT_{region}_jetPT_{pt}GeV"] = (50, 0.0, hi)
    for name in spec:
        vals[name] = []

    for ev in events.values():
        colls = jet_test_collections(ev)
        met = ev["met"]
        for pt in (30, 50, 100):
            full = colls[(pt, None)]
            vals[f"nJets_jetPT_{pt}GeV"].append(float(len(full)))
            if len(full) > 0:
                vals[f"MET_jetPT_{pt}GeV"].append(met)
            for k in (1, 2, 3, 4):
                if len(full) > k - 1:
                    vals[f"Jet{k}_pT_jetPT_{pt}GeV"].append(full[k - 1]["pt"])
                    vals[f"Jet{k}_eta_jetPT_{pt}GeV"].append(full[k - 1]["eta"])
                for region in regions:
                    c = colls[(pt, region)]
                    if len(c) > k - 1:
                        vals[f"Jet{k}_pT_{region}_jetPT_{pt}GeV"].append(
                            c[k - 1]["pt"]
                        )
    return {name: histogram_eqb(vals[name], *spec[name]) for name in spec}


def phase2_all_histograms(events: dict[int, dict]):
    """Golden values for ALL 61 phaseII plots (phaseII-analysis.py:368-498):
    noSel counts/MET, then per-selection blocks sel1..sel5 with muon/jet
    kinematics and the dimuon invariant mass."""
    spec: dict[str, tuple[int, float, float]] = {
        "nJetsNoSel": (10, 0.0, 10.0),
        "nbtaggedJetsNoSel": (10, 0.0, 10.0),
        "nMuNoSel": (15, 0.0, 15.0),
        "METptNoSel": (50, 0.0, 250.0),
    }

    def lepton_spec(sfx, sub_hi):
        spec[f"LeadingMuonPT{sfx}"] = (30, 0.0, 250.0)
        spec[f"SubLeadingMuonPT{sfx}"] = (30, 0.0, sub_hi)
        spec[f"LeadingMuonEta{sfx}"] = (30, -3.0, 3.0)
        spec[f"SubLeadingMuonEta{sfx}"] = (30, -3.0, 3.0)

    for sfx in ("Sel1", "Sel2", "Sel3", "Sel4", "Sel5"):
        spec[f"nJets{sfx}"] = (10, 0.0, 10.0)
        spec[f"nbtaggedJets{sfx}"] = (10, 0.0, 10.0)
        spec[f"nMu{sfx}"] = (10, 0.0, 10.0)
        spec[f"METpt{sfx}"] = (50, 0.0, 250.0)
    spec["InvMassTwoMuonsSel1"] = (30, 0.0, 300.0)
    spec["InvMassTwoMuonsSel2"] = (20, 20.0, 300.0)
    for sfx in ("Sel3", "Sel4", "Sel5"):
        spec[f"InvMassTwoMuons{sfx}"] = (30, 0.0, 300.0)
    lepton_spec("Sel1", 250.0)
    for sfx in ("Sel2", "Sel3", "Sel4", "Sel5"):
        lepton_spec(sfx, 200.0)
    for sfx, jet_hi in (("Sel3", 350.0), ("Sel4", 250.0), ("Sel5", 250.0)):
        spec[f"LeadingJetPT{sfx}"] = (50, 0.0, jet_hi)
        spec[f"SubLeadingJetPT{sfx}"] = (50, 0.0, jet_hi)
        spec[f"LeadingJetEta{sfx}"] = (30, -3.0, 3.0)
        spec[f"SubLeadingJetEta{sfx}"] = (30, -3.0, 3.0)

    vals: dict[str, list] = {name: [] for name in spec}
    for ev in events.values():
        o = phase2_objects(ev)
        mu, imu = o["muons"], o["ident_mu"]
        gj, bt, met = o["good_jets"], o["btagged"], o["met"]
        vals["nJetsNoSel"].append(float(len(gj)))
        vals["nbtaggedJetsNoSel"].append(float(len(bt)))
        vals["nMuNoSel"].append(float(len(imu)))
        vals["METptNoSel"].append(met)

        sel1 = len(imu) > 1 and imu[0]["charge"] * imu[1]["charge"] < 0
        m = round(invariant_mass(imu[0], imu[1]), 6) if len(imu) > 1 else None
        sel2 = sel1 and not (76 < m < 106)
        sel3 = sel2 and len(gj) > 1
        sel4 = sel3 and (bit2(gj[0]["btag"]) or bit2(gj[1]["btag"]))
        sel5 = sel4 and met > 40
        for ok, sfx in (
            (sel1, "Sel1"), (sel2, "Sel2"), (sel3, "Sel3"),
            (sel4, "Sel4"), (sel5, "Sel5"),
        ):
            if not ok:
                continue
            vals[f"nJets{sfx}"].append(float(len(gj)))
            vals[f"nbtaggedJets{sfx}"].append(float(len(bt)))
            vals[f"nMu{sfx}"].append(float(len(imu)))
            vals[f"METpt{sfx}"].append(met)
            vals[f"InvMassTwoMuons{sfx}"].append(m)
            vals[f"LeadingMuonPT{sfx}"].append(mu[0]["pt"])
            vals[f"SubLeadingMuonPT{sfx}"].append(mu[1]["pt"])
            vals[f"LeadingMuonEta{sfx}"].append(mu[0]["eta"])
            vals[f"SubLeadingMuonEta{sfx}"].append(mu[1]["eta"])
            if sfx in ("Sel3", "Sel4", "Sel5"):
                vals[f"LeadingJetPT{sfx}"].append(gj[0]["pt"])
                vals[f"SubLeadingJetPT{sfx}"].append(gj[1]["pt"])
                vals[f"LeadingJetEta{sfx}"].append(gj[0]["eta"])
                vals[f"SubLeadingJetEta{sfx}"].append(gj[1]["eta"])
    return {name: histogram_eqb(vals[name], *spec[name]) for name in spec}
