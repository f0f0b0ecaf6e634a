"""Contract entry for the full bambooRun-analog pipeline (driver.py).

Runs the reference's complete two-phase workflow (README.md:63-84) — two
pseudo-samples (FS/Delphes event-parity split, as in the reference's
FS-vs-Delphes comparison), per-sample single-pass analysis, histogram +
counter sinks, then postprocessing (yields.tex, cutflow image, plots.yml,
stacked plot images) — and returns a deterministic artifact manifest.

Rows-only check by design: the pipeline's verifiable numbers (histogram
contents, cutflows) are already oracle-checked query-by-query
(hep_cutflow_phase2, hep_histogram_* ...); this entry verifies the
end-to-end wiring and tracks its cost in the bench.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from ..driver import run_pipeline
from ..sources.catalog import parse_catalog

_CATALOG = {
    "eras": {"HL-LHC": {"luminosity": 3000000}},
    "samples": {
        "TT_FS": {
            "era": "HL-LHC", "type": "MC", "group": "FS",
            "cross-section": 950.0, "generated-events": "nEvents",
        },
        "TT_Delphes": {
            "era": "HL-LHC", "type": "SIGNAL", "group": "Delphes",
            "cross-section": 950.0, "generated-events": "nEvents",
            "stack-index": 1,
        },
    },
    "plotIt": {"luminosity-error": 0.025},
}


def pipeline_full_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .hep import _hep  # memoized fixture build

    hep = _hep(spark, sf_dir)
    # samples as a COLUMN of one table (events_tagged): the fused job scans
    # the fixture once; a union of two event_id-parity filters would scan
    # (and codegen) it once per sample
    tagged = hep.withColumn(
        "__sample",
        F.when(F.col("event_id") % 2 == 0, "TT_FS").otherwise("TT_Delphes"),
    )
    out_dir = tempfile.mkdtemp(prefix="bamboo-pipeline-")
    manifest = run_pipeline(
        spark, "phase2", parse_catalog(_CATALOG), out_dir, events_tagged=tagged
    )
    # artifact verification reads the files actually written, but via the
    # parquet FOOTERS (driver-side pyarrow) — launching a Spark job per
    # sample just to count a KB-sized histogram table was ~1.7s of the
    # pipeline's bench cost for zero information
    import glob
    import os

    import pyarrow.parquet as pq

    def _nrows(path: str) -> int:  # Spark writes a directory of part files
        return sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(path, "*.parquet"))
        )

    rows = [(f"hists/{s}", _nrows(p)) for s, p in sorted(manifest["hists"].items())]
    rows += [
        ("cutflow_rows/TT_FS", len(manifest["cutflows"]["TT_FS"])),
        ("cutflow_rows/TT_Delphes", len(manifest["cutflows"]["TT_Delphes"])),
        ("plot_images", len(manifest["plot_images"])),
        ("stacked_groups", int(manifest["stacked"]["group"].nunique())),
    ]
    return spark.createDataFrame(rows, "artifact string, n bigint").orderBy("artifact")


register("pipeline_full_run", pipeline_full_run)  # rows-only: wiring check
