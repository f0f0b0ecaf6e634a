"""Single-pass multi-histogram aggregation — the engine's one custom
physical strategy (SURVEY.md §4.2).

The reference books ~60-130 histograms plus cutflow counters and fills them
all in ONE event-loop pass per sample (RDataFrame lazy model). The naive
Spark translation — one groupBy job per plot — would scan the data 127
times. Instead:

    events --withColumn--> object collections + selection masks (shared,
                           deduped by Catalyst CSE inside codegen)
           --select-----> contribs: array<struct<pid, bin, bin2, w>>
                           (one entry per plot whose selection passes;
                            cutflow node = pid with bin 0)
           --explode----> groupBy(pid, bin, bin2).agg(sum(w), sum(w*w), n)

One scan, one shuffle whose key space is tiny (#plots x #bins, ~7k keys),
partial aggregation map-side — at 100 TB this is scan-bound, exactly like
the reference's event loop. No RDDs, no Python UDFs: the whole pass is
whole-stage-codegen'd.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cutflow import CutFlowReport
from .plots import Plot

# Cutflow entries are 1-bin "histograms", exactly how bamboo stores yields
# (phaseII-analysis.py:224-230: EqB(1, 0., 1.)).
_CUTFLOW_BIN = 0


def run_analysis(
    df: DataFrame,
    plots: Iterable[Plot],
    cutflows: Iterable[CutFlowReport] = (),
) -> DataFrame:
    """Compute every booked plot and cutflow counter in one job.

    Returns a long-format histogram table:
        plot: string, kind: string ('plot'|'cutflow'), bin: int, bin2: int
        (0 for 1D), sumw: double, sumw2: double, n: long
    """
    structs = []
    pid_name: list[tuple[str, str]] = []  # (name, kind) indexed by pid

    def book(name: str, kind: str, cond, bins, weight):
        pid = len(pid_name)
        pid_name.append((name, kind))
        b1 = bins[0].cast("int")
        b2 = (bins[1] if len(bins) > 1 else F.lit(0)).cast("int")
        valid = cond & b1.isNotNull() & b2.isNotNull()
        structs.append(
            F.when(
                valid,
                F.struct(
                    F.lit(pid).alias("pid"),
                    b1.alias("bin"),
                    b2.alias("bin2"),
                    weight.cast("double").alias("w"),
                ),
            )
        )

    for p in plots:
        book(p.name, "plot", p.selection.cond, p.bin_cols(), p.selection.weight)
    for cfr in cutflows:
        for sel, _title in cfr.entries:
            book(f"{cfr.name}/{sel.name}", "cutflow", sel.cond, [F.lit(_CUTFLOW_BIN)], sel.weight)

    if not structs:
        raise ValueError("nothing booked")

    contribs = F.filter(F.array(*structs), lambda c: c.isNotNull())
    agg = (
        df.select(F.explode(contribs).alias("c"))
        .select("c.pid", "c.bin", "c.bin2", "c.w")
        .groupBy("pid", "bin", "bin2")
        .agg(
            F.sum("w").alias("sumw"),
            F.sum(F.col("w") * F.col("w")).alias("sumw2"),
            F.count(F.lit(1)).alias("n"),
        )
    )

    name_map = F.create_map(
        *[x for pid, (name, _k) in enumerate(pid_name) for x in (F.lit(pid), F.lit(name))]
    )
    kind_map = F.create_map(
        *[x for pid, (_n, kind) in enumerate(pid_name) for x in (F.lit(pid), F.lit(kind))]
    )
    return agg.select(
        name_map[F.col("pid")].alias("plot"),
        kind_map[F.col("pid")].alias("kind"),
        "bin",
        "bin2",
        "sumw",
        "sumw2",
        "n",
    )


def cutflow_table(hist: DataFrame, report_name: str, order: list[str]) -> DataFrame:
    """Extract one cutflow report from the histogram table in DAG order,
    with the (N, SumW) semantics of printCutFlowReports
    (phaseII-analysis.py:190-199)."""
    prefix = report_name + "/"
    pos = F.create_map(
        *[x for i, s in enumerate(order) for x in (F.lit(prefix + s), F.lit(i))]
    )
    return (
        hist.where((F.col("kind") == "cutflow") & F.col("plot").startswith(prefix))
        .select(
            F.expr(f"substring(plot, {len(prefix) + 1})").alias("selection"),
            pos[F.col("plot")].alias("seq"),
            F.col("n").alias("num_events"),
            F.col("sumw").alias("sum_weights"),
        )
        .orderBy("seq")
    )
