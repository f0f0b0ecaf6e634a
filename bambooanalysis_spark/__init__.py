"""bambooanalysis_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of recotoolsbenchmarks/BambooAnalysis.

The reference (at /root/reference, read-only) is a declarative HEP analysis
layer over ROOT RDataFrame; this package re-expresses the same capability
surface Spark-first:

- event model: one DataFrame row per event, variable-length particle
  collections as ``array<struct<...>>`` columns (SURVEY.md §1.6),
- within-event operators as Spark higher-order functions (``filter`` /
  ``exists`` / ``aggregate`` / ``transform``) — no Python UDFs in the hot
  path, so Catalyst whole-stage codegen stays intact,
- selection DAGs as boolean mask columns evaluated in ONE pass,
- all histograms + cutflow counters of an analysis computed by a single
  explode→groupBy aggregation job per sample (SURVEY.md §4.2).

Layout:
    functions/   physics + text + vector column-expression functions
    operators/   collection ops (op.* analogs), dedup, similarity, text
    plans/       Selection DAG, Plot/binning, single-pass histogrammer, cutflow
    sources/     catalog (YAML sample/era config), HEP event-fixture builder
    streaming/   event-time windowed aggregation (batch + Structured Streaming)
    analyses/    parity analysis modules (phaseII, jet_test)
    report/      normalization, yields tables, efficiency reports
"""

__version__ = "0.1.0"
