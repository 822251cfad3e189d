"""Catalog-persisted tables: saveAsTable -> spark.table round trip.

BASELINE.json lists "Spark SQL with Hive metastore" as part of the target
deployment; ``session.get_spark`` already enables Hive support when the
classpath allows (session.py). This module exercises that path end to end:
a curated aggregate is WRITTEN through the catalog (``saveAsTable``, managed
parquet table partitioned by ``lang`` under ``spark.sql.warehouse.dir``) and
READ BACK through catalog metadata (``spark.table``) with a partition-pruned
filter — the layout/query pair a 100 TB curation pipeline runs: curate once,
persist partitioned, and every downstream consumer scans only the partitions
it asks for (``PartitionFilters`` in the scan node, pinned by
tests/test_plan_shapes.py).

Works identically on the in-memory catalog (this sandbox) and a real Hive
metastore: both resolve the same table identifier through the same Catalog
API — only the metadata store differs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table
from opencode_hive_archon_spark.spec import QuerySpec

CATALOG_DB = "engine_catalog"
CURATED_TABLE = "curated_doc_stats"
STAGING_TABLE = f"{CURATED_TABLE}_staging"
READBACK_LANG = "en"


def _clear_orphan_location(spark: SparkSession, table: str) -> None:
    """Remove a leftover managed-table directory the current catalog does
    not track (written by a previous session against the same warehouse)."""
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if warehouse:
        shutil.rmtree(
            os.path.join(warehouse, f"{CATALOG_DB}.db", table),
            ignore_errors=True,
        )


def save_curated_doc_stats(spark: SparkSession, sf_dir: str) -> str:
    """Aggregate per-(source, lang) document stats and persist them as a
    managed catalog table partitioned by lang. Returns the table identifier.

    Repeat calls are idempotent AND near-atomic for readers: the (slow)
    rewrite lands in a STAGING table first, then the published name is
    swapped via two metadata-only operations (DROP + RENAME). A concurrent
    reader of the published table never observes PARTIALLY WRITTEN DATA —
    but the name may briefly fail to resolve between the DROP and the
    RENAME, and a crash inside that window leaves the data reachable only
    under the staging name (recovery: rename the staging table back by
    hand). The in-memory / Hive v1 catalog cannot make the swap one atomic
    operation — a lakehouse format (Delta/Iceberg, unavailable in this
    sandbox; see sources/io.py) is the fully-atomic version of this same
    pattern."""
    docs = read_table(spark, sf_dir, "documents")
    curated = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {CATALOG_DB}")
    ident = f"{CATALOG_DB}.{CURATED_TABLE}"
    staging = f"{CATALOG_DB}.{STAGING_TABLE}"
    # With the in-memory catalog, a managed-table LOCATION can outlive the
    # session that registered it (the warehouse dir is on disk, the metadata
    # is not): a fresh session then fails saveAsTable with
    # LOCATION_ALREADY_EXISTS because overwrite can't drop a table it never
    # heard of. Drop via the catalog when known, then clear any orphaned
    # location. A Hive metastore deployment never hits the orphan branch.
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    _clear_orphan_location(spark, STAGING_TABLE)
    (
        curated.write.mode("overwrite")
        .format("parquet")
        .partitionBy("lang")
        .saveAsTable(staging)
    )
    # Publish: metadata-only swap (the managed RENAME moves the staging
    # directory under the published name). Partition entries keep their
    # write-time absolute locations through a RENAME, so re-discover them
    # from the moved directory — still metadata-only (file listing, no data
    # rewrite).
    spark.sql(f"DROP TABLE IF EXISTS {ident}")
    _clear_orphan_location(spark, CURATED_TABLE)
    spark.sql(f"ALTER TABLE {staging} RENAME TO {ident}")
    spark.sql(f"MSCK REPAIR TABLE {ident}")
    return ident


def catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the curated table through the catalog, then read it back BY
    NAME with a partition filter. The returned plan scans only the
    ``lang=en`` partition directory of the managed table."""
    ident = save_curated_doc_stats(spark, sf_dir)
    return (
        spark.table(ident)
        .filter(F.col("lang") == READBACK_LANG)
        .select("source", "lang", "n_docs", "total_chars", "first_doc")
        .orderBy("source")
    )


# DuckDB has no Spark catalog; the oracle states what the persisted table
# must CONTAIN for the read-back slice — same aggregate from the raw
# parquet. Sums cast to BIGINT (DuckDB sums BIGINT into HUGEINT).
_ORACLE_ROUNDTRIP = f"""
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS first_doc
FROM documents
WHERE lang = '{READBACK_LANG}'
GROUP BY source, lang
ORDER BY source
"""


SPECS = [
    QuerySpec(
        "catalog_roundtrip",
        catalog_roundtrip,
        _ORACLE_ROUNDTRIP,
        "sources",
        "saveAsTable -> spark.table catalog round trip: managed parquet "
        "table partitioned by lang, partition-pruned read-back",
    ),
]
