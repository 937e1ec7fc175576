"""Structured Streaming ingestion: continuous extraction over arriving
crawl batches.

The reference is strictly batch (SURVEY §2.10) and the north rule requires
*resumable batch* (plans/checkpoint.py). This module adds the natural
streaming form for incremental crawls: new parquet files landing in a
directory (or an Iceberg table's appends) are picked up by ``readStream``,
run through the SAME extraction kernels, and appended to the sink with
exactly-once semantics via the streaming checkpoint — the micro-batch
analogue of the bucket manifests.

Design notes for scale:
- the pipeline inside each micro-batch is identical to the batch plan
  (single mapInPandas, no shuffle) — watermarks/late data don't apply
  because extraction is stateless per document;
- ``maxFilesPerTrigger`` bounds micro-batch size (parse cost ~ bytes);
- ``Trigger.AvailableNow`` drains a backlog then stops — the scheduled-run
  mode; continuous mode just omits it.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession

from ..plans.extract import extract_text
from ..schemas import PAGES_SCHEMA


def stream_extract_text(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    layout: bool = False,
    max_files_per_trigger: Optional[int] = None,
    available_now: bool = True,
):
    """Continuously extract text from pages parquet files arriving in
    ``input_dir``; returns the started StreamingQuery."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_dir)
    # num_partitions=None: keep the stream's file-batch partitioning; the
    # extraction is stateless so no repartition shuffle is needed per batch
    extracted = extract_text(pages, layout=layout)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
