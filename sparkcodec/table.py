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

_MODES = ("append", "overwrite")
_FMTS = ("auto", "iceberg", "parquet")


def _is_identifier(target: str) -> bool:
    """Heuristic: catalog table identifiers (``catalog.db.table``) carry no
    path separators; anything with a '/' (or windows '\\\\') is a storage
    path and always takes the parquet branch."""
    return "/" not in target and "\\" not in target


def _resolve_use_iceberg(spark, target: str, fmt: str) -> bool:
    """Shared writer/reader resolution: Iceberg when pinned, or in auto
    mode when the target is identifier-shaped AND the session has an
    Iceberg catalog."""
    if fmt not in _FMTS:
        raise ValueError(f"fmt must be one of {_FMTS}, got {fmt!r}")
    return (fmt == "iceberg"
            or (fmt == "auto" and _is_identifier(target)
                and iceberg_available(spark)))


def iceberg_available(spark) -> bool:
    """True when the session can write Iceberg tables: the Iceberg Spark
    runtime is on the JVM classpath AND at least one catalog is configured
    as an Iceberg SparkCatalog.  Catalogs set at runtime via
    ``spark.conf.set`` count (the SQL ``SET`` listing includes them, unlike
    the static SparkContext conf)."""
    try:
        jvm = spark._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        return False
    confs = {r["key"]: r["value"] for r in spark.sql("SET").collect()}
    for k, v in spark.sparkContext.getConf().getAll():
        confs.setdefault(k, v)
    return any(k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower()
               for k, v in confs.items())


def write_encoded_table(enc_df, target: str, *, mode: str = "append",
                        fmt: str = "auto") -> str:
    """Persist an encoded chunk DataFrame (either payload layout).

    ``target`` is an Iceberg table identifier (``catalog.db.table``) when
    the Iceberg path is taken, else a filesystem/object-store directory
    for parquet.  Returns the format actually used ("iceberg"/"parquet").

    ``fmt="auto"`` picks Iceberg iff :func:`iceberg_available` AND the
    target looks like a table identifier (no path separators -- a path
    target always means parquet, even on an Iceberg cluster);
    ``fmt="iceberg"`` requires Iceberg and raises otherwise (clear error
    instead of a ClassNotFoundException buried in a JVM stack);
    ``fmt="parquet"`` pins the fallback.
    """
    spark = enc_df.sparkSession
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    if _resolve_use_iceberg(spark, target, fmt):
        if not iceberg_available(spark):
            raise RuntimeError(
                "fmt='iceberg' but no Iceberg runtime/catalog is configured "
                "on this SparkSession; add the iceberg-spark-runtime jar and "
                "a spark.sql.catalog.<name> = org.apache.iceberg.spark."
                "SparkCatalog configuration, or use fmt='auto'/'parquet'")
        writer = enc_df.writeTo(target).using("iceberg")
        if mode == "overwrite":
            writer.createOrReplace()
        elif spark.catalog.tableExists(target):
            writer.append()
        else:
            writer.create()
        return "iceberg"
    enc_df.write.mode(mode).parquet(target)
    return "parquet"


def read_encoded_table(spark, target: str, *, fmt: str = "auto"):
    """Read an encoded chunk table written by :func:`write_encoded_table`.
    Same resolution rule as the writer: Iceberg only for identifier-shaped
    targets on an Iceberg-enabled session (or when pinned)."""
    if _resolve_use_iceberg(spark, target, fmt):
        return spark.read.table(target)
    return spark.read.parquet(target)
