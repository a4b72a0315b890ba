"""Streaming telemetry over the engine's checkpoint directory.

The checkpoint store's per-wave parquet appends form a file-source stream:
new files appear atomically as waves commit, which is precisely the contract
spark.readStream's file source expects. This gives a live crawl dashboard
(URLs/sec, status mix, per-host counts) with zero changes to the engine —
the monitor is a separate, independently-failing process, unlike the
reference's in-process progress output (/root/reference/src/output/*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import VISITED_SCHEMA


def visited_stream(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """readStream over <ckpt>/visited/wave=*/ (one file per wave locally)."""
    return (
        spark.readStream.schema(VISITED_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(f"{checkpoint_dir}/visited")
    )


def status_mix(stream: DataFrame) -> DataFrame:
    return stream.groupBy("wave", "status_code").agg(F.count("*").alias("n"))


def run_to_memory(agg: DataFrame, name: str = "crawl_telemetry"):
    """Drive the streaming aggregate to completion synchronously (tests /
    local smoke); returns the query handle after processAllAvailable."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
