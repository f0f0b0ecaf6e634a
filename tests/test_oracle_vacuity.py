"""Two-scale non-emptiness audit (VERDICT r7 #8, systematizing the §37
lesson): an oracle-checked query that returns 0 rows at every scale
hash-matches 0 == 0 and its gate verifies NOTHING. rel_important_stock
shipped that way for a round before the vacuity was caught by hand —
this test makes the catch structural.

Every registered oracle runs through DuckDB at sf0.001 AND sf0.01; a
query empty at BOTH scales fails unless it carries an allowlist entry
with a written reason. (DuckDB-side only by design: vacuity is a
property of the query's semantics on the fixture, and the oracle and
Spark sides are hash-pinned equal by tests/test_contract_oracle.py, so
one engine suffices and the audit stays seconds-cheap.)

Round 9 (VERDICT r8 #3): the SAME blindspot existed for the rows-only
registrations (no oracle -> the driver records only a row count, and an
always-empty result "passes" while verifying nothing). Every registered
query WITHOUT an oracle now runs through Spark at both scales under the
same empty-at-both rule — the audit covers all registrations.
"""

import duckdb
import pytest

from bambooanalysis_spark.contract import ORACLES, QUERIES

SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# query name -> reason an empty result is intentional at tiny scales
ALLOWED_EMPTY: dict[str, str] = {}


@pytest.fixture(scope="module")
def cons():
    out = []
    for sf_dir in SCALES:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        out.append(con)
    yield out
    for con in out:
        con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_not_vacuous_at_two_scales(cons, name):
    sql = ORACLES[name]
    counts = [len(con.execute(sql).fetchall()) for con in cons]
    if all(c == 0 for c in counts):
        assert name in ALLOWED_EMPTY, (
            f"{name}: oracle returns 0 rows at sf0.001 AND sf0.01 — the "
            "hash gate is vacuous (0 == 0 matches anything). Reshape the "
            "query's thresholds to be scale-invariant (PERFORMANCE.md "
            "§37) or allowlist with a reason."
        )


# rows-only query name -> reason an empty result is intentional
ALLOWED_EMPTY_ROWS_ONLY: dict[str, str] = {}


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_not_vacuous_at_two_scales(spark, name):
    counts = [QUERIES[name](spark, sf_dir).count() for sf_dir in SCALES]
    if all(c == 0 for c in counts):
        assert name in ALLOWED_EMPTY_ROWS_ONLY, (
            f"{name}: rows-only query returns 0 rows at sf0.001 AND "
            "sf0.01 — its weaker rows-only driver check verifies "
            "nothing. Reshape it to be non-empty at tiny scales or "
            "allowlist with a reason."
        )
