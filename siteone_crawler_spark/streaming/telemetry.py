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


def fetch_time_windows(stream: DataFrame, window: str = "10 seconds",
                       watermark: str = "30 seconds") -> DataFrame:
    """Event-time windowed rates with a watermark: request_time_ms offsets a
    synthetic epoch into an event-time column, late rows beyond the
    watermark are dropped — the Structured-Streaming windowed-agg shape a
    live fetch feed would use (R1's monitoring analog)."""
    with_ts = stream.withColumn(
        "event_ts",
        F.timestamp_seconds(F.col("seq") / 100.0 + F.col("request_time_ms") / 1e5),
    )
    return (
        with_ts.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window), F.col("host"))
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum(F.when(F.col("status_code") != 200, 1).otherwise(0)).alias("n_bad"),
        )
    )


def host_budget_state_stream(stream: DataFrame, budget: int = 100) -> DataFrame:
    """Custom stateful operator: per-host running fetch counters with
    over-budget flagging via applyInPandasWithState — the
    arbitrary-stateful-processing surface (politeness accounting as a
    stream). State per host is one counter (bounded)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame(
            {"host": [key[0]], "n_total": [total], "over_budget": [total > budget]}
        )

    return stream.groupBy("host").applyInPandasWithState(
        update,
        outputStructType="host string, n_total long, over_budget boolean",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


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
