import pytest

from bambooanalysis_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark():
    # small core/partition counts keep test latency down; prod sizing is in
    # session.get_spark defaults
    s = get_spark(
        "bamboo-tests",
        cpus=8,
        shuffle_partitions=8,
        # static conf: must be set at session creation (bucketed-table test)
        extra_conf={"spark.sql.warehouse.dir": "/tmp/bamboo-test-warehouse"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle():
    return SF_ORACLE


@pytest.fixture(scope="session")
def sf_bench():
    return SF_BENCH
