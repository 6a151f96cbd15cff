#!/usr/bin/env python
"""spark-submit entrypoint for the checkpoint-resumable encode job.

Usage (north-rule launch shape):

    # package the library once
    (cd /root/repo && zip -qr /tmp/sparkcodec.zip sparkcodec)

    spark-submit --master local[8]  --py-files /tmp/sparkcodec.zip \
        jobs/encode_job.py --input /path/tokens.parquet --output /path/out \
        --num-partitions 64 --snapshot mytable@v7

    # resume after a failure: identical command; completed buckets skip
    spark-submit --master local[32] --py-files /tmp/sparkcodec.zip \
        jobs/encode_job.py --input ... --output ...   # same args

The input must have the contract schema (doc_id string, tokens
array<int32>, n_tok int32, source string) or any subset of supported
column types; buckets are a pure function of (source, doc_id), so a rerun
on N or 4N executors resumes the same plan.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="input parquet path")
    ap.add_argument("--output", required=True, help="output dir (chunks/ + manifest/)")
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--snapshot", default="", help="input snapshot id for lineage")
    ap.add_argument("--job-id", default="encode")
    ap.add_argument("--weight-col", default="n_tok")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--chunk-rows", type=int, default=None)
    ap.add_argument("--token-budget", type=int, default=None)
    # (bloom columns parsed below with whitespace stripped: 'a, b' == 'a,b')
    ap.add_argument("--bloom-columns", default="",
                    help="comma-separated columns to build bloom filters for")
    ap.add_argument("--split-payload", action="store_true",
                    help="per-column payload layout (payload_<col> BINARY "
                         "columns; projections prune at the parquet reader)")
    ap.add_argument("--mode", choices=("buckets", "files"), default="buckets",
                    help="buckets: weight-proportional shuffle + bucket resume; "
                         "files: shuffle-free scan-side fast path, file-level resume")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"sparkcodec-{args.job_id}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    blooms = tuple(c.strip() for c in args.bloom_columns.split(",") if c.strip())
    if args.mode == "files":
        from sparkcodec.manifest import run_encode_files_job

        summary = run_encode_files_job(
            spark, args.input, args.output,
            job_id=args.job_id,
            input_snapshot=args.snapshot,
            chunk_rows=args.chunk_rows,
            token_budget=args.token_budget,
            bloom_columns=blooms,
            split_payload=args.split_payload,
        )
    else:
        from sparkcodec.manifest import run_encode_job

        df = spark.read.parquet(args.input)
        summary = run_encode_job(
            spark, df, args.output,
            num_partitions=args.num_partitions,
            job_id=args.job_id,
            input_snapshot=args.snapshot,
            weight_col=args.weight_col,
            source_col=args.source_col,
            id_col=args.id_col,
            chunk_rows=args.chunk_rows,
            token_budget=args.token_budget,
            bloom_columns=blooms,
            split_payload=args.split_payload,
        )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
