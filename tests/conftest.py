import pytest

from networkit_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="networkit-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


def edges_df(spark, edges, weighted=True):
    """Build an edge DataFrame from [(u, v[, w]), ...]."""
    rows = [
        (int(e[0]), int(e[1]), float(e[2]) if len(e) > 2 else 1.0) for e in edges
    ]
    return spark.createDataFrame(rows, "src long, dst long, weight double")
