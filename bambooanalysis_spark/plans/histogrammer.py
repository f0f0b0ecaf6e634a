"""Single-pass multi-histogram aggregation — the engine's one custom
physical strategy (SURVEY.md §4.2).

The reference books ~60-130 histograms plus cutflow counters and fills them
all in ONE event-loop pass per sample (RDataFrame lazy model). The naive
Spark translation — one groupBy job per plot — would scan the data 127
times. Instead:

    events --withColumn--> object collections (analysis modules)
           --withColumn--> selection masks+weights, level by level:
                           mask(child) = mask(parent) AND local_cut —
                           every shared selection prefix is evaluated
                           exactly ONCE per event as a named column
           --withColumn--> distinct plotted value expressions (deduped
                           across plots that reuse them)
           --select-----> contribs: array<struct<pid, bin, bin2, w>>
                           referencing only those named columns
           --explode----> groupBy(pid, bin, bin2).agg(sum(w), sum(w*w), n)

One scan, one shuffle whose key space is tiny (#plots x #bins, ~7k keys),
partial aggregation map-side — at 100 TB this is scan-bound, exactly like
the reference's event loop. No RDDs, no Python UDFs: the whole pass is
whole-stage-codegen'd. The mask/value materialization exists because a
127-wide when()-array that inlines each selection's full conjunction would
re-evaluate deep expression trees per plot (measured ~2x slower at sf0.1).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .cutflow import CutFlowReport
from .plots import Plot
from .selection import Selection

# Cutflow entries are 1-bin "histograms", exactly how bamboo stores yields
# (phaseII-analysis.py:224-230: EqB(1, 0., 1.)).
_CUTFLOW_BIN = 0


def _materialize_dag(df: DataFrame, selections: list[Selection]):
    """Add one boolean mask column and one weight column per selection
    node, parents before children so each mask is parent_mask AND
    local_cut. Returns (df, {id(sel): (mask_col, weight_col)})."""
    # transitive closure up to the root(s)
    seen: dict[int, Selection] = {}

    def visit(s: Selection):
        while s is not None and id(s) not in seen:
            seen[id(s)] = s
            s = s.parent

    for s in selections:
        visit(s)

    # group by depth so each withColumns layer only references earlier ones
    def depth(s: Selection) -> int:
        d = 0
        while s.parent is not None:
            s, d = s.parent, d + 1
        return d

    by_depth: dict[int, list[Selection]] = {}
    for s in seen.values():
        by_depth.setdefault(depth(s), []).append(s)

    names: dict[int, tuple[str, str]] = {}
    for d in sorted(by_depth):
        layer: dict[str, Column] = {}
        for s in by_depth[d]:
            i = len(names)
            m, w = f"__mask_{i}", f"__w_{i}"
            names[id(s)] = (m, w)
            if s.parent is None:
                layer[m] = s.cond
                layer[w] = s.weight
            elif not hasattr(s, "local_cut"):
                # node built via the public Selection(...) constructor, not
                # refine(): there are no incremental pieces, and deriving
                # the mask from the parent column alone would silently DROP
                # this node's own cut (round-4 review finding). Evaluate
                # its full cond/weight directly — correct, merely loses
                # prefix sharing for this one node.
                layer[m] = F.coalesce(s.cond.cast("boolean"), F.lit(False))
                layer[w] = s.weight
            else:
                pm, pw = names[id(s.parent)]
                local = s.local_cut
                cond = F.col(pm) if local is None else (F.col(pm) & local)
                lw = s.local_weight
                layer[m] = cond
                layer[w] = F.col(pw) if lw is None else (F.col(pw) * lw)
        df = df.withColumns(layer)
    return df, names


def run_analysis(
    df: DataFrame,
    plots: Iterable[Plot],
    cutflows: Iterable[CutFlowReport] = (),
    extra_keys: Iterable[str] = (),
    max_bookings_per_job: int | None = None,
) -> DataFrame:
    """Compute every booked plot and cutflow counter in one job.

    Returns a long-format histogram table:
        plot: string, kind: string ('plot'|'cutflow'), bin: int, bin2: int,
        bin3: int (0 for unused axes), sumw: double, sumw2: double, n: long

    ``extra_keys`` names pass-through columns of ``df`` that ride the
    aggregation key (prepended to the output schema). The driver uses this
    to fuse a whole multi-sample catalog into ONE job: a '__sample' tag
    multiplies the tiny (#plots x #bins) key space by #samples — still
    aggregate-sized — while the event scan and the per-job fixed costs
    (planning, codegen, scheduling) are paid once instead of per sample.

    ``max_bookings_per_job``: codegen-width escape hatch. The contribs
    projection is one generated expression over ALL bookings; it stays
    inside whole-stage codegen to at least 200 single-axis bookings
    (pinned by tests/test_histogrammer.py::
    test_histogrammer_codegen_at_200_plots with codegen fallback
    DISABLED), but an analysis booking many hundreds of wide plots can
    exceed the JVM's 64KB-per-method generated-code ceiling, where Spark
    silently drops to interpreted evaluation (measured 7x slower when one
    extra struct field tipped the 61-plot phaseII projection). Setting
    this splits the bookings into ceil(N/max) independent jobs whose
    outputs are unioned — K scans instead of one, each guaranteed narrow
    enough to compile. Prefer the single job (scan-bound, like the
    reference's event loop); reach for this only when a plan audit shows
    the fallback actually tripping.
    """
    extra_keys = list(extra_keys)
    plots = list(plots)
    cutflows = list(cutflows)
    if max_bookings_per_job is not None:
        n_bookings = len(plots) + sum(len(c.entries) for c in cutflows)
        if n_bookings > max_bookings_per_job:
            return _run_analysis_chunked(
                df, plots, cutflows, extra_keys, max_bookings_per_job
            )
    sels = [p.selection for p in plots] + [
        sel for cfr in cutflows for (sel, _t) in cfr.entries
    ]
    if not sels:
        raise ValueError("nothing booked")
    # NOTE: Catalyst constraint propagation is super-linear in the number
    # of boolean mask columns (hundreds here) and contributes nothing to
    # this plan shape — disabling it halves wall time at sf0.1 (measured,
    # PERFORMANCE.md §4). It is session tuning, so it belongs to the
    # session owner: session.get_spark sets it, and the driver-contract
    # wrapper pins it per query. We deliberately do NOT mutate the caller's
    # session here.
    df, mask_names = _materialize_dag(df, sels)

    # dedupe plotted value expressions: plots routinely reuse the same
    # Column object (n_jets across 6 selections etc.) — one column each
    val_names: dict[int, str] = {}
    val_layer: dict[str, Column] = {}

    def val_col(expr: Column) -> str:
        key = id(expr)
        if key not in val_names:
            name = f"__val_{len(val_names)}"
            val_names[key] = name
            val_layer[name] = expr
        return val_names[key]

    # Bookings as TEXT: masks/weights/values are named columns by now, and
    # each binning emits its textual twin (plots.bin_sql), so the entire
    # ~130-entry contribs array is assembled as ONE SQL string parsed in a
    # single JVM call. The per-Column form cost ~10-15 py4j round-trips per
    # booking (~2000 for phaseII) — over 1s of pure plan-build latency per
    # invocation (PERFORMANCE.md §22). Semantics pinned by the 127
    # golden-plot tests + the hep DuckDB oracles.
    bookings = []  # (mask_name, [bin SQL strings], weight_name)
    pid_name: list[tuple[str, str]] = []
    for p in plots:
        m, w = mask_names[id(p.selection)]
        bins = [
            b.bin_sql(f"`{val_col(e)}`") for e, b in zip(p.exprs, p.binnings)
        ]
        pid_name.append((p.name, "plot"))
        bookings.append((m, bins, w))
    for cfr in cutflows:
        for sel, _title in cfr.entries:
            m, w = mask_names[id(sel)]
            pid_name.append((f"{cfr.name}/{sel.name}", "cutflow"))
            bookings.append((m, [str(_CUTFLOW_BIN)], w))
    if val_layer:
        df = df.withColumns(val_layer)

    # Carry ONLY the bin axes some booked plot actually uses: at ~130
    # bookings the contribs array sits near whole-stage-codegen size limits,
    # and one extra struct field tipped the 61-plot phaseII projection into
    # interpreted fallback (measured 7x slower). Missing axes are padded
    # with literal zeros AFTER aggregation, where rows number #plots x #bins.
    ndims = max(len(bins) for (_m, bins, _w) in bookings)
    axis_names = ["bin", "bin2", "bin3"][:ndims]

    structs = []
    for pid, (mask, bins, weight) in enumerate(bookings):
        bsqls = [
            f"CAST(({bins[i]}) AS INT)" if i < len(bins) else "0"
            for i in range(ndims)
        ]
        valid = " AND ".join([f"`{mask}`"] + [f"({b}) IS NOT NULL" for b in bsqls])
        fields = ", ".join(
            [f"'pid', {pid}"]
            + [f"'{n}', {b}" for b, n in zip(bsqls, axis_names)]
            + [f"'w', CAST(`{weight}` AS DOUBLE)"]
        )
        structs.append(f"CASE WHEN {valid} THEN named_struct({fields}) END")
    contribs = F.expr(
        "filter(array({}), c -> c IS NOT NULL)".format(", ".join(structs))
    )
    agg = (
        df.select(*extra_keys, F.explode(contribs).alias("c"))
        .select(*extra_keys, "c.pid", *[f"c.{n}" for n in axis_names], "c.w")
        .groupBy(*extra_keys, "pid", *axis_names)
        .agg(
            F.sum("w").alias("sumw"),
            F.sum(F.col("w") * F.col("w")).alias("sumw2"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    for missing in ["bin", "bin2", "bin3"][ndims:]:
        agg = agg.withColumn(missing, F.lit(0))

    def _q(s: str) -> str:
        # Backslashes first, then quotes — a name containing a backslash
        # would otherwise corrupt the parsed SQL string literal.
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    name_map = F.expr(
        "map({})".format(
            ", ".join(
                f"{pid}, {_q(name)}" for pid, (name, _k) in enumerate(pid_name)
            )
        )
    )
    kind_map = F.expr(
        "map({})".format(
            ", ".join(
                f"{pid}, {_q(kind)}" for pid, (_n, kind) in enumerate(pid_name)
            )
        )
    )
    return agg.select(
        *extra_keys,
        name_map[F.col("pid")].alias("plot"),
        kind_map[F.col("pid")].alias("kind"),
        "bin",
        "bin2",
        "bin3",
        "sumw",
        "sumw2",
        "n",
    )


def _run_analysis_chunked(
    df: DataFrame,
    plots: list[Plot],
    cutflows: list[CutFlowReport],
    extra_keys: list[str],
    chunk: int,
) -> DataFrame:
    """Split bookings into <=chunk-sized groups, one run_analysis job per
    group, outputs unioned. Row-identical to the fused job: each output
    row depends only on its own booking (plot names are unique across the
    union), so partitioning the booking set partitions the output set.
    Units are whole plots / whole cutflow reports — a report's entries
    stay together so cutflow_table reads one chunk's rows."""
    units: list[tuple[int, Plot | CutFlowReport]] = [(1, p) for p in plots]
    units += [(len(c.entries), c) for c in cutflows]
    groups: list[tuple[list[Plot], list[CutFlowReport]]] = []
    size = 0
    for weight, unit in units:
        # always open the first group (even for a weight-0 unit, e.g. an
        # entry-less CutFlowReport); after that, open a new one when the
        # unit would overflow a non-empty group
        if not groups or (size + weight > chunk and size > 0):
            groups.append(([], []))
            size = 0
        groups[-1][isinstance(unit, CutFlowReport)].append(unit)
        size += weight
    out = None
    for gplots, gcfrs in groups:
        part = run_analysis(df, gplots, gcfrs, extra_keys)
        out = part if out is None else out.unionByName(part)
    return out


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
