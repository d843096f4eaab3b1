"""Environment-drift smoke tests.

Round 2 shipped broken because a Spark upgrade silently changed how the
events parquet loads (`spark.sql.legacy.parquet.nanosAsLong` became a
no-op in 4.1, so `ts` reads as TIMESTAMP_NTZ instead of long nanos).
These tests pin down every dtype assumption the engine makes about the
driver-generated testdata, so the next environment drift fails HERE —
in seconds, with a clear message — instead of in the driver's
correctness/bench run.
"""

import os

import pytest
from pyspark.sql import types as T

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

TIMESTAMPY = (T.TimestampType, T.TimestampNTZType, T.LongType)


def _dtype(spark, table, col):
    df = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
    return df.schema[col].dataType


def test_events_ts_loads_as_known_type(spark):
    """events.ts must be long-nanos OR a timestamp type — `_ts_ts_col`
    handles exactly these; anything else means new Spark behavior."""
    dt = _dtype(spark, "events", "ts")
    assert isinstance(dt, TIMESTAMPY), f"events.ts loaded as {dt}"


def test_events_load_produces_timestamp(spark):
    from metacat_spark.streaming import events as EV
    ev = EV.load_events(spark, SF_DIR)
    assert isinstance(ev.schema["ts_ts"].dataType, T.TimestampType)
    # and it must be evaluable, not just analyzable
    assert ev.limit(1).count() >= 0


def test_embeddings_schema(spark):
    dt = _dtype(spark, "embeddings", "embedding")
    assert isinstance(dt, T.ArrayType), f"embedding loaded as {dt}"
    assert isinstance(dt.elementType, (T.FloatType, T.DoubleType)), \
        f"embedding element type {dt.elementType}"


def test_documents_schema(spark):
    assert isinstance(_dtype(spark, "documents", "text"), T.StringType)
    assert isinstance(_dtype(spark, "documents", "doc_id"),
                      (T.LongType, T.IntegerType, T.StringType))


@pytest.mark.parametrize("table,col,want", [
    ("lineitem", "l_quantity", (T.DecimalType, T.DoubleType)),
    ("orders", "o_orderdate",
     (T.DateType, T.TimestampType, T.TimestampNTZType, T.StringType)),
    ("part", "p_retailprice", (T.DecimalType, T.DoubleType)),
])
def test_tpch_dtypes(spark, table, col, want):
    assert isinstance(_dtype(spark, table, col), want)


def test_all_tables_present_and_readable(spark):
    from metacat_spark.catalog import RAW_TABLES
    for t in RAW_TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            assert spark.read.parquet(path).limit(1).count() >= 0, t
