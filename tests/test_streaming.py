"""Structured Streaming ingestion: micro-batches run the same incremental
index path as batch ``index()`` — idempotent per content hash, graph state
identical to a one-shot batch index of the same corpus."""

import numpy as np
import pandas as pd
import pytest

from hipporag_spark.engine import HippoIndex
from hipporag_spark.streaming import corpus_stream, stream_index


def _corpus_pdf(rows, start=0):
    return pd.DataFrame(
        [
            {"repo": "org0/a", "path": f"src/f{start + i}.py",
             "commit": f"c{start + i}", "lang": "py", "content": content}
            for i, content in enumerate(rows)
        ]
    )


DOCS_A = ["alpha beta gamma", "beta gamma delta", "delta epsilon"]
DOCS_B = ["epsilon zeta", "zeta alpha"]


@pytest.mark.usefixtures("spark")
def test_stream_index_matches_batch(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # two parquet drops → two micro-batch arrivals
    spark.createDataFrame(_corpus_pdf(DOCS_A)).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    spark.createDataFrame(_corpus_pdf(DOCS_B, start=len(DOCS_A))).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))

    streamed = HippoIndex(spark, str(tmp_path / "idx_stream"))
    q = stream_index(
        streamed,
        corpus_stream(spark, str(in_dir), max_files_per_trigger=1),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(120)
    assert not q.isActive
    assert len(q.batch_stats) >= 1

    # stream(2 micro-batches) ≡ index() called twice with the same splits —
    # the foreachBatch contract.  (Synonym edges in the default incremental
    # mode depend on batch granularity — each batch's NEW entities query the
    # then-current store — so the reference comparison uses the same splits,
    # not one merged batch.)
    batch = HippoIndex(spark, str(tmp_path / "idx_batch"))
    batch.index(spark.createDataFrame(_corpus_pdf(DOCS_A)))
    batch.index(spark.createDataFrame(_corpus_pdf(DOCS_B, start=len(DOCS_A))))

    for table in ("chunks", "entities", "edges", "synonym_edges", "fact_pairs"):
        s = streamed.cat.read(table).toPandas()
        b = batch.cat.read(table).toPandas()
        cols = sorted(s.columns)
        s = s[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(s, b, check_dtype=False)

    # the additive base state is batch-granularity independent: a one-shot
    # index of everything yields the same fact-pair counts and membership
    # (synonym edges — and hence the merged edge winners — legitimately
    # depend on granularity in incremental mode; the same-split comparison
    # above covers them)
    oneshot = HippoIndex(spark, str(tmp_path / "idx_oneshot"))
    oneshot.index(spark.createDataFrame(_corpus_pdf(DOCS_A + DOCS_B)))
    for table in ("fact_pairs", "membership", "chunks", "entities"):
        a = streamed.cat.read(table).toPandas()
        b = oneshot.cat.read(table).toPandas()
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_stream_index_idempotent_on_replay(spark, tmp_path):
    in_dir = tmp_path / "in2"
    in_dir.mkdir()
    spark.createDataFrame(_corpus_pdf(DOCS_A)).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))

    idx = HippoIndex(spark, str(tmp_path / "idx_replay"))
    for ckpt in ("ck1", "ck2"):  # fresh checkpoint ⇒ source replays from scratch
        q = stream_index(
            idx,
            corpus_stream(spark, str(in_dir)),
            checkpoint_dir=str(tmp_path / ckpt),
            trigger_once=True,
        )
        q.awaitTermination(120)
    chunks = idx.cat.read("chunks").toPandas()
    assert len(chunks) == len(DOCS_A)  # content-hash upsert absorbed the replay


def test_stream_per_batch_work_is_o_batch(spark, tmp_path):
    """Each micro-batch appends exactly one data file per touched table
    (prior files carried by reference — never rewritten), so per-batch
    write cost is O(batch), not O(corpus); compact_every folds them."""
    in_dir = tmp_path / "in3"
    in_dir.mkdir()
    spark.createDataFrame(_corpus_pdf(DOCS_A)).coalesce(1).write.mode(
        "append").parquet(str(in_dir))
    spark.createDataFrame(_corpus_pdf(DOCS_B, start=len(DOCS_A))).coalesce(1).write.mode(
        "append").parquet(str(in_dir))

    idx = HippoIndex(spark, str(tmp_path / "idx_cost"))
    q = stream_index(
        idx,
        corpus_stream(spark, str(in_dir), max_files_per_trigger=1),
        checkpoint_dir=str(tmp_path / "ckpt3"),
        trigger_once=True,
    )
    q.awaitTermination(120)
    assert len(q.batch_stats) == 2
    # batch 2 inserted only its own rows...
    assert q.batch_stats[1]["chunks"] == len(DOCS_B)
    # ...and the chunk table holds exactly one data file per batch, the
    # first of which is byte-identical to what batch 1 committed
    assert idx.cat.file_count("chunks") == 2
    files = idx.cat._files("chunks")
    assert len(files) == 2

    # compaction folds the files; the table content is unchanged
    before = sorted(r["chunk_id"] for r in idx.cat.read("chunks").collect())
    idx.compact()
    assert idx.cat.file_count("chunks") == 1
    after = sorted(r["chunk_id"] for r in idx.cat.read("chunks").collect())
    assert before == after
