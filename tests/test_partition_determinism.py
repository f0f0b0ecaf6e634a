"""Partition-layout independence: the oracle-checked results must be
BIT-identical under a different shuffle partitioning — the difference
between local[32] and a 1000-executor cluster is exactly this, so any
partition-order-dependent float sum or nondeterministic tie-break would
make cluster results diverge from the gate. The engineered guarantees
(integer/DECIMAL aggregates, per-row IEEE math, deterministic tie-break
chains) make these queries layout-invariant by construction; this test
enforces it for a representative slice."""

import pandas as pd
import pytest

QUERIES_UNDER_TEST = [
    "hep_cutflow_phase2",      # double sums of unit weights (exact ints)
    "hep_histograms_1d",       # weighted fills (integer-valued doubles)
    "pipeline_full_run",       # end-to-end manifest incl. scale arithmetic
    "rel_pricing_summary",     # DECIMAL money aggregates
    "corpus_datacard",         # rollup + exact count-distinct
    "dedup_signatures",        # md5/minhash signature determinism
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_results_identical_under_repartitioning(spark, sf_oracle, name):
    from bambooanalysis_spark.contract import QUERIES

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    base = QUERIES[name](spark, sf_oracle).toPandas()
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = QUERIES[name](spark, sf_oracle).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    a, b = _canon(base), _canon(alt)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        assert (pd.isna(av) == pd.isna(bv)).all(), f"{name}.{c} null layout"
        mask = ~pd.isna(av)
        assert (av[mask] == bv[mask]).all(), f"{name}.{c} differs"
