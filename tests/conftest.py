import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metacat_spark.catalog import RAW_TABLES, from_tpch  # noqa: E402
from metacat_spark.engine import Engine  # noqa: E402
from metacat_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("metacat_spark_tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def catalog(spark):
    return from_tpch(spark, SF_DIR)


@pytest.fixture(scope="session")
def engine(catalog):
    return Engine(catalog)


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in RAW_TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def ids_of(df):
    return sorted(r["id"] for r in df.select("id").collect())


def duck_ids(duck, sql):
    return sorted(r[0] for r in duck.execute(sql).fetchall())


@pytest.fixture(scope="session")
def engine_small(engine):
    """Engine with the id-ordered base list cached for slicing laws."""
    ids = [r["id"] for r in
           engine.query("files from dune:urgent_0 ordered").collect()]
    engine._all_ids_cache = ids
    return engine
