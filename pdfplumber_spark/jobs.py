"""spark-submit entrypoint (north_rule: "run via spark-submit --py-files on
a multi-executor cluster").

Usage:
    spark-submit --py-files pdfplumber_spark.zip -m pdfplumber_spark.jobs \
        extract --input /data/pages --output /data/extracted \
        --buckets 4096 [--layout] [--resume]

    python -m pdfplumber_spark.jobs extract ...   (local mode, same flags)

Subcommands map 1:1 to the reference CLI surface (``pdfplumber/cli.py``):
extract (text), objects (csv/json of chars/lines/rects/curves), words,
tables — each writing parquet/csv/json sinks.
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(args):
    from .session import get_spark

    if args.local_cores:
        return get_spark(app_name=f"pdfplumber-spark-{args.cmd}", cores=args.local_cores)
    from pyspark.sql import SparkSession

    return SparkSession.builder.appName(f"pdfplumber-spark-{args.cmd}").getOrCreate()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="pdfplumber_spark.jobs")
    ap.add_argument("cmd", choices=["extract", "objects", "words", "tables"])
    ap.add_argument("--input", required=True, help="pages table path (parquet/iceberg)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", default="parquet", choices=["parquet", "json", "csv"])
    ap.add_argument("--layout", action="store_true", help="layout=True text")
    ap.add_argument("--buckets", type=int, default=0,
                    help="checkpointed run with N url-hash buckets (resumable)")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--local-cores", type=int, default=0,
                    help="local[N] session (0 = cluster session from spark-submit)")
    ap.add_argument("--vertical-strategy", default="lines")
    ap.add_argument("--horizontal-strategy", default="lines")
    args = ap.parse_args(argv)

    spark = _session(args)
    from .plans import extract as X

    pages = X.read_pages(spark, args.input)

    if args.cmd == "extract":
        if args.buckets:
            from .plans.checkpoint import run_extraction_checkpointed

            summary = run_extraction_checkpointed(
                spark, args.input, args.output,
                n_buckets=args.buckets, layout=args.layout,
            )
            print(json.dumps(summary))
            return 0
        out = X.extract_text(pages, layout=args.layout, num_partitions=args.partitions)
    elif args.cmd == "objects":
        out = X.extract_objects(pages, num_partitions=args.partitions)
    elif args.cmd == "words":
        out = X.extract_words(pages, num_partitions=args.partitions)
    else:  # tables
        out = X.extract_tables(
            pages,
            num_partitions=args.partitions,
            vertical_strategy=args.vertical_strategy,
            horizontal_strategy=args.horizontal_strategy,
        )

    writer = out.write.mode("overwrite")
    if args.format == "parquet":
        writer.parquet(args.output)
    elif args.format == "json":
        writer.json(args.output)
    else:
        # csv: flatten complex cols to json strings (convert.py:15-30 analogue)
        from pyspark.sql import functions as F, types as T

        flat = out
        for f_ in out.schema.fields:
            if isinstance(f_.dataType, (T.ArrayType, T.StructType, T.MapType)):
                flat = flat.withColumn(f_.name, F.to_json(f_.name))
        flat.write.mode("overwrite").option("header", True).csv(args.output)
    print(json.dumps({"cmd": args.cmd, "output": args.output, "rows": out.count()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
