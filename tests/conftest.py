from __future__ import annotations

import pytest

from igpm_pem_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="igpm-pem-tests",
        cores=4,
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "8g",
            # tiny test graphs: skip AQE's plan churn for faster supersteps
            "spark.sql.adaptive.enabled": "false",
        },
    )
    yield s
    s.stop()


def edges_df(spark, pairs, schema="src BIGINT, dst BIGINT"):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs], schema)
