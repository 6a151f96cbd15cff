"""Table-format adapter: Iceberg-managed when the session has an Iceberg
catalog, plain parquet otherwise.

The target deployment writes encoded chunk tables back as Iceberg-managed
binary columns (SURVEY.md §7.1 step 5).  This sandbox ships no Iceberg
runtime jar (verified at build time: no ``iceberg-spark-runtime`` on the
session classpath), so the adapter resolves ``fmt="auto"`` to the plain
parquet path here, and to ``df.writeTo(...).using("iceberg")`` on any
cluster whose SparkSession is configured with an Iceberg catalog.  Either
way the engine's own per-partition lineage manifests
(:mod:`sparkcodec.manifest`: input snapshot id, codec tags, bytes in/out,
throughput) provide the checkpoint/resume contract, so the parquet
fallback loses no functionality the engine relies on -- Iceberg adds its
own snapshot isolation and metadata tree on top when present.
"""

from __future__ import annotations

__all__ = [
    "iceberg_available",
    "write_encoded_table",
    "read_encoded_table",
]


def iceberg_available(spark) -> bool:
    """True when the session can write Iceberg tables: the Iceberg Spark
    runtime is on the JVM classpath AND at least one catalog is configured
    as an Iceberg SparkCatalog."""
    try:
        jvm = spark._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        return False
    confs = spark.sparkContext.getConf().getAll()
    return any(k.startswith("spark.sql.catalog.") and "iceberg" in v.lower()
               for k, v in confs)


def write_encoded_table(enc_df, target: str, *, mode: str = "append",
                        fmt: str = "auto") -> str:
    """Persist an encoded chunk DataFrame (either payload layout).

    ``target`` is an Iceberg table identifier (``catalog.db.table``) when
    the Iceberg path is taken, else a filesystem/object-store directory
    for parquet.  Returns the format actually used ("iceberg"/"parquet").

    ``fmt="auto"`` picks Iceberg iff :func:`iceberg_available`;
    ``fmt="iceberg"`` requires it and raises otherwise (clear error
    instead of a ClassNotFoundException buried in a JVM stack);
    ``fmt="parquet"`` pins the fallback.
    """
    spark = enc_df.sparkSession
    if fmt not in ("auto", "iceberg", "parquet"):
        raise ValueError(f"fmt must be auto|iceberg|parquet, got {fmt!r}")
    use_iceberg = iceberg_available(spark) if fmt == "auto" else fmt == "iceberg"
    if use_iceberg:
        if not iceberg_available(spark):
            raise RuntimeError(
                "fmt='iceberg' but no Iceberg runtime/catalog is configured "
                "on this SparkSession; add the iceberg-spark-runtime jar and "
                "a spark.sql.catalog.<name> = org.apache.iceberg.spark."
                "SparkCatalog configuration, or use fmt='auto'/'parquet'")
        writer = enc_df.writeTo(target).using("iceberg")
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            # append; create on first write
            try:
                writer.append()
            except Exception:
                writer.create()
        return "iceberg"
    enc_df.write.mode("overwrite" if mode == "overwrite" else "append") \
        .parquet(target)
    return "parquet"


def read_encoded_table(spark, target: str, *, fmt: str = "auto"):
    """Read an encoded chunk table written by :func:`write_encoded_table`."""
    if fmt not in ("auto", "iceberg", "parquet"):
        raise ValueError(f"fmt must be auto|iceberg|parquet, got {fmt!r}")
    use_iceberg = (fmt == "iceberg"
                   or (fmt == "auto" and iceberg_available(spark)
                       and "/" not in target))
    if use_iceberg:
        return spark.read.table(target)
    return spark.read.parquet(target)
