"""Structured Streaming front-end for the same batch pipeline.

The reference is a resumable batch pipeline with no streaming (SURVEY
§2.7); this is the Spark-native extension: new document files landing in
a directory are picked up by a file-source stream and pushed through the
IDENTICAL batch lineage via foreachBatch - one code path for batch and
streaming (the deterministic ids make the merge idempotent: re-delivered
documents produce identical rows).

Also provides the canonical event-time windowed aggregation with
watermarking over the ``events`` table shape, demonstrating late-data
handling for stream analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.synth import FILES_SCHEMA


def stream_files_to_graph(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-arrival stream -> triples, exactly-once via the stream
    checkpoint + append mode.  Returns the StreamingQuery."""
    from ..plans import pipeline as P

    stream = (
        spark.readStream.schema(FILES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs = P.docs_from_files(batch_df)
        triples = P.triples(batch_df.sparkSession, docs, cache=True)
        (
            triples.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(f"{out_dir}/triples")
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_first_seen(
    stream_df: DataFrame,
    key_col: str,
):
    """Custom stateful operator: emit each key's row only the FIRST time
    it is ever seen across ALL micro-batches (keyed state via
    applyInPandasWithState) - the streaming equivalent of the
    reference's get-or-insert uniqueness probes
    (/root/reference/models/crud/read.py:233-318).

    The deterministic content-hash ids make this exactly the semantics
    of the batch dedup: re-delivered or duplicated documents yield
    id-identical rows, and the state (one boolean per key) suppresses
    them forever after.  State size = one entry per distinct key -
    partitioned by key across executors, the same scale shape as the
    batch groupBy.
    """
    import pandas as pd  # noqa: F811
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    schema = stream_df.schema

    def first_seen(key, pdfs, state: GroupState):
        if state.exists:
            # key already emitted in an earlier batch - consume and drop
            for _ in pdfs:
                pass
            return
        first_row = None
        for pdf in pdfs:
            if len(pdf) and first_row is None:
                first_row = pdf.iloc[[0]]
        state.update((True,))
        if first_row is not None:
            yield first_row

    return stream_df.groupBy(key_col).applyInPandasWithState(
        first_seen,
        outputStructType=schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts with late-data watermark -
    the standard streaming aggregation shape (works identically on a
    batch DataFrame, where the watermark is a no-op)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
