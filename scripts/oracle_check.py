"""Driver-style correctness harness: run __spark_entry__.queries() against
oracle_sql() in DuckDB at a given sf dir and compare rows / schema / value
hash the way the round driver does (columns sorted by name, values hashed).

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""
from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _hash_df(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        rows.append(repr(tup))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERR {e}")
            bad.append(name)
            continue
        if name not in oracles:
            print(f"{name}: no_oracle rows={len(spdf)}")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERR {e}")
            bad.append(name)
            continue
        rows_ok = len(spdf) == len(opdf)
        schema_ok = sorted(spdf.columns) == sorted(opdf.columns)
        hash_ok = rows_ok and schema_ok and _hash_df(spdf) == _hash_df(opdf)
        tag = "GREEN" if hash_ok else "RED"
        print(f"{name}: {tag} rows={len(spdf)}/{len(opdf)} schema={schema_ok}")
        if not hash_ok:
            bad.append(name)
            if rows_ok and schema_ok and len(spdf) <= 5:
                print("  spark:", spdf.to_dict("records"))
                print("  oracle:", opdf.to_dict("records"))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
