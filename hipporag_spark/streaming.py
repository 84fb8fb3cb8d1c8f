"""Structured Streaming ingestion → incremental graph indexing.

The reference has **no** streaming semantics — its closest analog is the
batch-incremental ``HippoRAG.index`` called repeatedly on new corpora
(``/root/reference/src/hipporag/HippoRAG.py:215-275``; SURVEY.md §2.6).
This module gives that loop a Spark-native always-on form: a file-source
``readStream`` over a corpus directory, with each micro-batch routed
through :class:`hipporag_spark.engine.HippoIndex` inside
``foreachBatch`` — so every arrival runs the same content-hash upsert /
anti-join path as a manual ``index()`` call, and the result stays
exactly-once at the table level (upserts are idempotent per content
hash; a replayed micro-batch inserts nothing new).

``foreachBatch`` (not a streaming sink) is deliberate: graph indexing is
a multi-table transactional upsert with a graph rebuild at the end —
not an append — which is precisely the pattern Structured Streaming
documents for stateful multi-sink writes.  Watermarks/windows are not
needed: corpus files carry no event-time semantics (late data = just
another batch of new content hashes).

At 100 TB the same topology holds: the file source becomes a cloud-files
/ Iceberg CDC source, micro-batches are bounded by
``maxFilesPerTrigger``, and the graph rebuild stage is the incremental
edge upsert (only chunks first seen in the batch produce new fact
edges, mirroring ``HippoRAG.py:756``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .engine import HippoIndex

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def corpus_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int = 32,
) -> DataFrame:
    """File-source streaming DataFrame of corpus rows (parquet files
    dropped into ``input_dir``)."""
    return (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def stream_index(
    index: HippoIndex,
    corpus_stream_df: DataFrame,
    checkpoint_dir: str,
    trigger_once: bool = False,
    compact_every: int | None = None,
):
    """Run the incremental indexer as a streaming query.

    Returns the started ``StreamingQuery``; callers own its lifecycle
    (``awaitTermination`` / ``stop``).  ``trigger_once=True`` drains
    whatever is currently in the source and stops — the streaming
    equivalent of one ``index()`` call, used in tests and backfills.
    ``compact_every=k`` folds each table's accumulated per-batch data
    files into one every k processed micro-batches (the maintenance job
    that keeps an always-on stream's file counts bounded).
    """
    stats: list[dict] = []

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        counts = index.index(batch_df)
        stats.append({"batch_id": batch_id, **counts})
        if compact_every and len(stats) % compact_every == 0:
            index.compact()

    writer = (
        corpus_stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    query.batch_stats = stats  # type: ignore[attr-defined]
    return query
