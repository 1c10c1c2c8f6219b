#!/usr/bin/env python
"""spark-submit job: encode a source-code table into a blockstore.

Usage (north_rule run mode):
    cd /root/repo && zip -qr /tmp/pqs.zip parquet_python_spark
    spark-submit --master local[32] --py-files /tmp/pqs.zip \
        scripts/submit_encode.py --input <parquet dir> --store <store dir> \
        [--rows-per-part 250000] [--verify]

On a real cluster, replace --master and add executor confs; the job itself
is cluster-size agnostic (the partition plan is a pure function of the
data — see parquet_python_spark/plans/partitioning.py).
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet dir with (repo, path, commit, lang, content)")
    ap.add_argument("--store", required=True, help="blockstore output dir")
    ap.add_argument("--rows-per-part", type=int, default=250_000)
    ap.add_argument("--compression", default="UNCOMPRESSED")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--verify", action="store_true",
                    help="decode everything back and check sha multiset equality")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from parquet_python_spark.operators import pipeline as pl

    spark = SparkSession.builder.appName("pqs-encode").getOrCreate()
    df = spark.read.parquet(args.input)
    t0 = time.perf_counter()
    stats = pl.run_encode(df, args.store, target_rows=args.rows_per_part,
                          compression=args.compression,
                          resume=not args.no_resume)
    stats["wall_sec"] = round(time.perf_counter() - t0, 2)
    stats["gbps"] = round(stats["raw_bytes"] / 1e9 / stats["wall_sec"], 4)
    if args.verify:
        decoded = pl.decode_blocks(pl.read_blocks(spark, args.store))
        stats["verify"] = pl.verify_roundtrip(df, decoded)
    print(json.dumps(stats))
    spark.stop()
    return 0 if (not args.verify or stats["verify"]["ok"]) else 1


if __name__ == "__main__":
    sys.exit(main())
