"""Catalog: the engine's table registry.

Holds the metacat-shaped DataFrames (files, datasets, files_datasets,
parent_child, datasets_parent_child, namespaces, queries_tbl) and their
metadata schemas. ``from_tpch`` builds all of them lazily from the
driver's TPC-H-ish parquet testdata via the fixtures mapping — every
fixture table is a pure projection, so Catalyst collapses it into the
parquet scan and prunes unused columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fixtures as FX
from .schema import DATASET_META, FILE_META, QUERY_META, MetaSchema

RAW_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]


@dataclass
class Catalog:
    spark: SparkSession
    files: DataFrame
    files_datasets: DataFrame
    parent_child: DataFrame
    datasets: DataFrame
    datasets_parent_child: DataFrame
    namespaces: DataFrame
    queries_tbl: DataFrame
    file_meta: MetaSchema = field(default_factory=lambda: FILE_META)
    dataset_meta: MetaSchema = field(default_factory=lambda: DATASET_META)
    query_meta: MetaSchema = field(default_factory=lambda: QUERY_META)
    raw: dict = field(default_factory=dict)
    # reference parameter_categories table (schema.sql:162-176); DML
    # loads validation rules from here. None = DEFAULT_CATEGORIES.
    parameter_categories: Optional[DataFrame] = None
    # when set, file predicates resolve through this native
    # VariantType column instead of shredded columns / JSON-string
    # fallback (the variant warehouse mode; see materialize_tables)
    file_variant_column: Optional[str] = None
    # id-uniqueness invariant for the engine's set-algebra id-set fast
    # path: True/False once known, None = unknown (probe on first use).
    # The reference holds it by PK construction (schema.sql:45-63); we
    # record it at warehouse ingest (table property) and maintain it
    # through DML. ANY assignment to .files resets it to None —
    # invariant-preserving mutators restore it explicitly, so an ingest
    # path that forgets can only cause a re-probe, never a wrong
    # fast-path answer.
    ids_unique: Optional[bool] = None

    def __setattr__(self, name, value):
        if name == "files" and "ids_unique" in self.__dict__:
            object.__setattr__(self, "ids_unique", None)
        object.__setattr__(self, name, value)

    def named_query_source(self, namespace: str, name: str) -> Optional[str]:
        rows = (self.queries_tbl
                .where((F.col("namespace") == namespace) & (F.col("name") == name))
                .select("source").limit(1).collect())
        return rows[0][0] if rows else None


def _meta_json_column(schema: MetaSchema) -> F.Column:
    """metadata as a JSON string with dotted keys; null-valued (missing)
    keys are omitted (Spark's to_json ignoreNullFields default)."""
    return F.to_json(F.struct(*[
        F.col(mk.column).alias(mk.key) for mk in schema.by_key.values()
    ]))


def from_dataframes(spark: SparkSession, files: DataFrame,
                    files_datasets: DataFrame,
                    parent_child: Optional[DataFrame] = None,
                    datasets: Optional[DataFrame] = None,
                    datasets_parent_child: Optional[DataFrame] = None,
                    namespaces: Optional[DataFrame] = None,
                    queries_tbl: Optional[DataFrame] = None,
                    file_meta: Optional[MetaSchema] = None) -> Catalog:
    """Source-agnostic construction: any Spark-readable source (parquet,
    JSON, CSV, JDBC, Delta, a stream sink...) can back the catalog —
    callers provide DataFrames with the canonical columns. ``files``
    needs at minimum (id, namespace, name, size, retired, metadata);
    unshredded deployments can pass ``file_meta=MetaSchema([])`` and
    every predicate runs through the JSON/variant fallback path."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    def _empty(cols: list[str]):
        return spark.createDataFrame([], ", ".join(
            f"{c} string" for c in cols))

    cat = Catalog(
        spark, files, files_datasets,
        parent_child if parent_child is not None
        else _empty(["parent_id", "child_id"]),
        datasets if datasets is not None
        else files_datasets.select(
            F.col("dataset_namespace").alias("namespace"),
            F.col("dataset_name").alias("name")).distinct()
            .withColumns({"frozen": F.lit(False),
                          "monotonic": F.lit(False),
                          "creator": F.lit(None).cast("string"),
                          "description": F.lit(None).cast("string"),
                          "created_timestamp":
                              F.lit(None).cast("timestamp"),
                          "metadata": F.lit("{}")}),
        datasets_parent_child if datasets_parent_child is not None
        else _empty(["parent_namespace", "parent_name",
                     "child_namespace", "child_name"]),
        namespaces if namespaces is not None
        else files.select(F.col("namespace").alias("name")).distinct()
            .withColumn("owner_user", F.lit(None).cast("string")),
        queries_tbl if queries_tbl is not None
        else _empty(["namespace", "name", "source", "creator",
                     "description", "metadata"]),
    )
    if file_meta is not None:
        cat.file_meta = file_meta
    return cat


def materialize_tables(spark: SparkSession, sf_dir: str,
                       buckets: int = 32, variant: bool = False) -> None:
    """One-time ingest: persist the big fixture tables as bucketed,
    id-sorted parquet tables (files ⋈ files_datasets ⋈ parent_child all
    join on file id). Bucketing co-locates the join keys so membership
    and provenance semi-joins run shuffle-free; sorting gives min/max
    row-group skipping on id point-lookups. This mirrors how a real
    deployment would own its storage (the reference's PostgreSQL heap +
    indexes, re-expressed as Spark-managed layout).

    ``variant=True`` additionally builds the VARIANT-mode files table:
    metadata stored as ONE native Spark-4 VariantType column
    (``metadata_v``) with no shredded m_* columns — the schema-free
    alternative a deployment with unpredictable metadata keys would
    pick. Predicate-cost trade-off measured in docs/SCALING.md."""
    cat = from_tpch(spark, sf_dir)
    suffix = sf_dir.rstrip("/").split("/")[-1].replace(".", "_")
    specs = [
        (cat.files, f"mcw_files_{suffix}", "id"),
        (cat.files_datasets, f"mcw_fd_{suffix}", "file_id"),
        (cat.parent_child, f"mcw_pc_{suffix}", "child_id"),
    ]
    if variant:
        shredded = [mk.column for mk in cat.file_meta.by_key.values()]
        files_v = (cat.files.drop(*shredded)
                   .withColumn("metadata_v", F.parse_json("metadata")))
        specs.append((files_v, f"mcw_files_var_{suffix}", "id"))
    for df, table, key in specs:
        if not spark.catalog.tableExists(table):
            # the default in-memory catalog forgets tables between
            # sessions while their warehouse directories persist —
            # clear any orphaned location before re-ingesting
            import shutil
            loc = (spark.conf.get("spark.sql.warehouse.dir")
                   .removeprefix("file:"))
            shutil.rmtree(f"{loc}/{table}", ignore_errors=True)
            (df.write.bucketBy(buckets, key).sortBy(key)
             .format("parquet").mode("overwrite").saveAsTable(table))
    # record the id-uniqueness invariant at ingest (one aggregation,
    # paid once per warehouse build — not on a user's first set-op
    # query); backfills warehouses built before the property existed
    _ensure_ids_unique_property(spark, f"mcw_files_{suffix}")


_IDS_UNIQUE_PROP = "metacat.ids_unique"


def _ids_unique_property(spark: SparkSession, table: str) -> Optional[bool]:
    """Read the persisted invariant; metadata-only, no Spark job."""
    props = {r["key"]: r["value"] for r in
             spark.sql(f"SHOW TBLPROPERTIES {table}").collect()}
    v = props.get(_IDS_UNIQUE_PROP)
    return None if v is None else v == "true"


def _ensure_ids_unique_property(spark: SparkSession, table: str) -> bool:
    known = _ids_unique_property(spark, table)
    if known is None:
        known = (spark.table(table).groupBy("id").count()
                 .where(F.col("count") > 1).isEmpty())
        spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES "
                  f"('{_IDS_UNIQUE_PROP}'='{str(known).lower()}')")
    return known


def from_materialized(spark: SparkSession, sf_dir: str,
                      variant: bool = False) -> Catalog:
    """Catalog over the bucketed warehouse tables (ingest must have
    run). Small literal tables stay in-memory. ``variant=True`` serves
    file predicates from the native VariantType table (no shredded
    columns — variant_get paths compile instead)."""
    materialize_tables(spark, sf_dir, variant=variant)
    cat = from_tpch(spark, sf_dir)
    suffix = sf_dir.rstrip("/").split("/")[-1].replace(".", "_")
    if variant:
        cat.files = spark.table(f"mcw_files_var_{suffix}")
        cat.file_meta = MetaSchema([])
        cat.file_variant_column = "metadata_v"
    else:
        cat.files = spark.table(f"mcw_files_{suffix}")
    cat.files_datasets = spark.table(f"mcw_fd_{suffix}")
    cat.parent_child = spark.table(f"mcw_pc_{suffix}")
    # invariant recorded at ingest — the engine's set-algebra fast
    # path needs no first-query probe over the files table
    cat.ids_unique = _ids_unique_property(spark, f"mcw_files_{suffix}")
    for name in ("files", "files_datasets", "parent_child"):
        getattr(cat, name).createOrReplaceTempView(f"mc_{name}")
    return cat


def from_tpch(spark: SparkSession, sf_dir: str,
              cache_files: bool = False) -> Catalog:
    # epoch-seconds derivations (core.timestamp) interpret NTZ
    # timestamps in the session timezone; pin UTC so results are
    # identical under externally-created sessions (incl. the driver's).
    # nanosAsLong lets the TIMESTAMP(NANOS) events table register.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = {}
    for t in RAW_TABLES:
        try:
            df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        except Exception:
            continue
        raw[t] = df
        df.createOrReplaceTempView(t)

    files = spark.sql(FX.files_sql(FX.SPARK))
    files = (files
             .withColumn("metadata", _meta_json_column(FILE_META))
             .withColumn("checksums",
                         F.create_map(F.lit("adler32"),
                                      F.substring(F.md5(F.col("id")), 1, 8)))
             .withColumn("updated_by", F.lit(None).cast("string"))
             .withColumn("updated_timestamp", F.lit(None).cast("timestamp"))
             .withColumn("retired_by",
                         F.when(F.col("retired"), F.lit("admin")))
             .withColumn("retired_timestamp",
                         F.when(F.col("retired"), F.col("created_timestamp"))))
    if cache_files:
        files = files.persist()

    files_datasets = spark.sql(FX.files_datasets_sql(FX.SPARK))
    parent_child = spark.sql(FX.parent_child_sql(FX.SPARK))

    datasets = spark.createDataFrame(FX.DATASET_ROWS, FX.DATASET_COLUMNS)
    datasets = (datasets
                .withColumn("created_timestamp",
                            F.lit("2023-01-15 00:00:00").cast("timestamp"))
                .withColumn("metadata", _meta_json_column(DATASET_META)))
    ds_pc = spark.createDataFrame(FX.DS_EDGE_ROWS, FX.DS_EDGE_COLUMNS)
    namespaces = spark.createDataFrame(FX.NAMESPACE_ROWS, FX.NAMESPACE_COLUMNS)
    queries_tbl = spark.createDataFrame(FX.QUERY_ROWS, FX.QUERY_COLUMNS)
    queries_tbl = queries_tbl.withColumn(
        "metadata", _meta_json_column(QUERY_META))

    from .validation import CATEGORY_COLUMNS, category_rows
    param_cats = spark.createDataFrame(category_rows(),
                                       CATEGORY_COLUMNS)
    cat = Catalog(spark, files, files_datasets, parent_child, datasets,
                  ds_pc, namespaces, queries_tbl, raw=raw,
                  parameter_categories=param_cats)
    for name in ("files", "files_datasets", "parent_child", "datasets",
                 "datasets_parent_child", "namespaces", "queries_tbl",
                 "parameter_categories"):
        getattr(cat, name).createOrReplaceTempView(f"mc_{name}")
    return cat
