"""Table resolution: Iceberg when available, parquet otherwise.

The production deployment reads/writes Iceberg tables (north rule:
"Iceberg-backed Common-Crawl-style web pages"): partition pruning,
snapshot isolation (a build pass commits one snapshot = one checkpoint
boundary), MERGE INTO for the incremental path, and hidden
partitioning on bucket(url) / days(warc_ts).

Neither the Iceberg Spark runtime jar nor pyiceberg is present in this
sandbox, so the catalog degrades to directory-of-parquet with the SAME
table shapes; every write in the engine goes through `write_table` /
`append_table` so the switch is one module. The Iceberg branch is
exercised only when `ICEBERG_AVAILABLE` is true at runtime.

Cluster configuration (documented for the spark-submit deployment):

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \
      --conf spark.sql.catalog.search=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.search.type=hadoop \
      --conf spark.sql.catalog.search.warehouse=<warehouse-uri> ...

Then `docs` resolves as `search.db.docs`, and build passes use
`df.writeTo("search.db.postings").append()` with snapshot-per-pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

try:  # gate: present only when the runtime ships the Iceberg jar
    _probe_err: Exception | None = None
    import py4j  # noqa: F401  (always present with pyspark)

    def _has_iceberg(spark: SparkSession) -> bool:
        # Class.forName raises ClassNotFoundException when the jar is
        # absent. A bare `spark._jvm.org.apache.iceberg...` attribute
        # probe does NOT — py4j returns a JavaPackage placeholder for
        # any dotted name — so it would report Iceberg present in every
        # sandbox (caught by the gate test, tests/test_iceberg_gate.py)
        try:
            spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
                "org.apache.iceberg.spark.SparkCatalog"
            )
            return True
        except Exception:
            return False

except Exception as e:  # pragma: no cover
    _probe_err = e

    def _has_iceberg(spark: SparkSession) -> bool:
        return False


def iceberg_available(spark: SparkSession) -> bool:
    return _has_iceberg(spark)


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """ref = Iceberg table name (contains a catalog dot) or a parquet
    path."""
    if "/" not in ref and iceberg_available(spark):
        return spark.read.table(ref)
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "overwrite") -> None:
    if "/" not in ref and iceberg_available(df.sparkSession):
        if mode == "overwrite":
            df.writeTo(ref).createOrReplace()
        else:
            df.writeTo(ref).append()
        return
    df.write.mode(mode).parquet(ref)


def append_table(df: DataFrame, ref: str) -> None:
    write_table(df, ref, mode="append")
