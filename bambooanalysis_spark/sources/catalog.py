"""Sample/era catalog — the reference's YAML config layer (SURVEY.md §1.5).

Reproduces the semantics of the reference's analysis configs
(jet_test.yml, phaseII-analysis-FS*.yml): per-era luminosity, per-sample
era/type/group/files/cross-section/generated-events/stack-index, and the
plotIt rendering options. The loader is pure driver-side Python; samples
become per-sample DataFrames (multi-path parquet scans) and normalization
constants joined as literals, exactly as SURVEY.md §1.6 prescribes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

try:
    import yaml  # PyYAML ships with pyspark deps in most distributions
except ImportError:  # pragma: no cover
    yaml = None


@dataclass
class Sample:
    name: str
    era: str | None = None
    type: str = "MC"  # MC | SIGNAL | DATA (phaseII-analysis.py:76-78)
    group: str | None = None
    files: list[str] = field(default_factory=list)
    cross_section: float | None = None  # pb (jet_test.yml:13)
    generated_events: float | str | None = None  # literal or counter name
    stack_index: int = 0

    @property
    def is_mc(self) -> bool:
        return self.type.upper() in ("MC", "SIGNAL")


@dataclass
class Catalog:
    tree: str | None
    eras: dict[str, dict]  # era -> {"luminosity": pb^-1, ...} (jet_test.yml:3-4)
    samples: dict[str, Sample]
    plot_defaults: dict

    def luminosity(self, era: str | None) -> float:
        if era is None and len(self.eras) == 1:
            era = next(iter(self.eras))
        return float(self.eras[era]["luminosity"])

    def scale(self, sample: str, counters: dict[str, float] | None = None) -> float:
        """MC normalization: luminosity x cross-section / generated-events
        (phaseII-analysis.py:210-217; inputs jet_test.yml:4,12-13).
        ``generated-events`` may name a counter merged at ingest
        (mergeCounters, phaseII-analysis.py:21-35)."""
        s = self.samples[sample]
        if not s.is_mc:
            return 1.0
        gen = s.generated_events
        if isinstance(gen, str):
            if not counters or gen not in counters:
                raise KeyError(f"counter {gen!r} not found for sample {sample!r}")
            gen = counters[gen]
        return self.luminosity(s.era) * float(s.cross_section) / float(gen)


def parse_catalog(cfg: dict) -> Catalog:
    eras = cfg.get("eras", {})
    samples = {}
    for name, sc in cfg.get("samples", {}).items():
        samples[name] = Sample(
            name=name,
            era=sc.get("era"),
            type=sc.get("type", "MC"),
            group=sc.get("group"),
            files=list(sc.get("files", [])),
            cross_section=sc.get("cross-section"),
            generated_events=sc.get("generated-events"),
            stack_index=sc.get("stack-index", 0),
        )
    return Catalog(
        tree=cfg.get("tree"),
        eras=eras,
        samples=samples,
        plot_defaults=cfg.get("plotIt", {}),
    )


def load_catalog(path: str) -> Catalog:
    if yaml is None:  # pragma: no cover
        raise ImportError("PyYAML required for YAML catalogs; use parse_catalog(dict)")
    with open(path) as f:
        return parse_catalog(yaml.safe_load(f))


def merge_counters(spark, sample: Sample) -> dict[str, float]:
    """mergeCounters analog (phaseII-analysis.py:21-32): per-sample total
    input events, summed across the sample's files at ingest time."""
    n = 0
    for path in sample.files:
        n += spark.read.parquet(path).count()
    return {"nEvents": float(n), "genEvents": float(n)}


def validate_catalog(catalog: "Catalog", tree: str | None = None) -> dict[str, list[str]]:
    """Pre-flight validation of a jet_test.yml-style catalog against its
    actual files — header-level only, so it is safe to run against real
    (compressed, streamer-carrying) ROOT inputs before any ingest job:

    - ``.root`` files go through ``minroot.sniff_file`` (TFile header +
      TKey chain walk, no decompression): the file must parse and, when
      ``tree``/``catalog.tree`` names one, declare that tree or baskets.
    - parquet files must open via the pyarrow footer (schema readable).
    - missing paths and samples with no files are flagged.

    Returns {sample: [problem, ...]} with only problem entries — empty
    dict means the catalog is runnable. Driver-side metadata work only
    (one small read per file), deliberately not a Spark job."""
    import os

    problems: dict[str, list[str]] = {}
    want_tree = tree or catalog.tree

    def flag(sample: str, msg: str) -> None:
        problems.setdefault(sample, []).append(msg)

    for name, sample in catalog.samples.items():
        if not sample.files:
            flag(name, "no files listed")
            continue
        for path in sample.files:
            if not os.path.exists(path):
                flag(name, f"missing file: {path}")
                continue
            if path.endswith(".root"):
                from . import minroot

                try:
                    info = minroot.sniff_file(path)
                except (ValueError, NotImplementedError) as e:
                    flag(name, f"unreadable ROOT header: {path}: {e}")
                    continue
                trees = set(info["trees"]) | set(info["branches"])
                # real files store 'dir/tree' as a TDirectory key 'dir'
                # plus a TTree key 'tree' (no slash in the key name);
                # minroot writes the slash-containing name literally.
                # Accept the bare tree name ONLY when the directory part
                # is also present as a key — otherwise 'anaA/events'
                # would pass against a file holding anaB/events.
                # ROOT's 'name;cycle' suffix pins a specific backup cycle
                # (bare names mean highest): validated against the cycles
                # sniff saw on the TTree key chain.
                key_names = {k[1] for k in info["keys"]}
                spec, cyc = want_tree, None
                if spec and ";" in spec:
                    spec, c = spec.rsplit(";", 1)
                    cyc = int(c)
                ok = spec in trees if spec else True
                if not ok and spec and "/" in spec:
                    d, base = spec.rsplit("/", 1)
                    ok = base in trees and d in key_names
                if ok and cyc is not None:
                    base = spec.rsplit("/", 1)[-1]
                    cycles = info.get("tree_cycles", {}).get(base, [])
                    if cyc not in cycles:
                        flag(
                            name,
                            f"tree {spec!r} has no cycle {cyc} in {path} "
                            f"(cycles: {cycles})",
                        )
                if want_tree and not ok:
                    # a file declaring NO trees at all (histogram-only or
                    # wrong file) is just as unrunnable as one declaring
                    # the wrong tree — distinct message, same severity
                    found = sorted(t for t in trees if t)
                    flag(
                        name,
                        f"tree {want_tree!r} not declared in {path} "
                        + (f"(found: {found})" if found else "(no trees found)"),
                    )
            else:
                try:
                    import pyarrow.parquet as pq

                    pq.ParquetFile(path).schema_arrow
                except Exception as e:  # pyarrow raises several types here
                    flag(name, f"unreadable parquet footer: {path}: {e}")
    return problems
