"""Streaming sequence packing: batch-operator parity and checkpoint restart."""

import glob
import os

import pandas as pd

from aeon_sleap_processing_spark.operators.curation import pack_sequences
from aeon_sleap_processing_spark.streaming.watch import stream_pack_sequences

CAP = 16


def _write_batch(spark, src, doc_ids, lens, shard="s0"):
    pdf = pd.DataFrame(
        {
            "shard": [shard] * len(doc_ids),
            "doc_id": doc_ids,
            "n_tokens": lens,
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)


def _run_stream(spark, src, chk, name):
    """availableNow run into a memory sink (no checkpoint: memory sinks
    can't recover; used where one run sees all files)."""
    stream = (
        spark.readStream.schema("shard string, doc_id long, n_tokens long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_pack_sequences(stream, capacity=CAP)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _run_stream_ckpt(spark, src, chk, rows):
    """availableNow run that RESUMES from a checkpoint; closed sequences are
    appended to ``rows`` via foreachBatch (memory sinks can't recover)."""
    stream = (
        spark.readStream.schema("shard string, doc_id long, n_tokens long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_pack_sequences(stream, capacity=CAP)
        .writeStream.foreachBatch(lambda df, _bid: rows.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _batch_closed(spark, lens):
    """Batch-operator ground truth: all sequences except the final partial."""
    texts = [" ".join(["w"] * n) for n in lens]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(len(texts))), "text": texts})
    )
    full = pack_sequences(df, capacity=CAP).toPandas()
    total = sum(lens)
    if total % CAP != 0:  # final partial sequence never closes in streaming
        full = full[full.seq_id < total // CAP]
    return full[["seq_id", "n_docs", "n_tokens", "n_starts"]].reset_index(drop=True)


class TestStreamPackSequences:
    def test_batch_parity_across_microbatches(self, spark, tmp_path):
        src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
        lens = [3, 10, 4, 7, 1, 12, 5, 40, 2, 9]
        # two files -> two micro-batches (maxFilesPerTrigger=1): packing
        # must carry the open sequence across the batch boundary
        _write_batch(spark, src, list(range(5)), lens[:5])
        _write_batch(spark, src, list(range(5, 10)), lens[5:])
        _run_stream(spark, src, chk, "pack_out")

        got = (
            spark.sql("SELECT seq_id, n_docs, n_tokens, n_starts FROM pack_out")
            .toPandas()
            .sort_values("seq_id", ignore_index=True)
        )
        expected = _batch_closed(spark, lens)
        pd.testing.assert_frame_equal(
            got.astype("int64"), expected.astype("int64")
        )

    def test_state_survives_checkpoint_restart(self, spark, tmp_path):
        src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
        lens_a, lens_b, lens_c = [5, 9, 3], [11, 2, 13], [8, 21]
        rows: list = []
        # cycle 1: two files
        _write_batch(spark, src, [0, 1, 2], lens_a)
        _write_batch(spark, src, [3, 4, 5], lens_b)
        _run_stream_ckpt(spark, src, chk, rows)
        # cycle 2: new file, FRESH query object, same checkpoint — the open
        # sequence's offset/aggregates must come back from the state store
        _write_batch(spark, src, [6, 7], lens_c)
        _run_stream_ckpt(spark, src, chk, rows)

        got = (
            pd.DataFrame([r.asDict() for r in rows])[
                ["seq_id", "n_docs", "n_tokens", "n_starts"]
            ]
            .sort_values("seq_id", ignore_index=True)
        )
        expected = _batch_closed(spark, lens_a + lens_b + lens_c)
        pd.testing.assert_frame_equal(
            got.astype("int64"), expected.astype("int64")
        )
        # restart really happened: checkpoint holds committed offsets
        assert glob.glob(os.path.join(chk, "offsets", "*"))

    def test_multi_shard_independent_offsets(self, spark, tmp_path):
        src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
        _write_batch(spark, src, [0, 1], [20, 20], shard="a")
        _write_batch(spark, src, [0, 1], [16, 16], shard="b")
        _run_stream(spark, src, chk, "pack_shards")
        got = spark.sql(
            "SELECT shard, seq_id, n_tokens FROM pack_shards"
        ).toPandas()
        by = {s: g.sort_values("seq_id") for s, g in got.groupby("shard")}
        # shard a: 40 tokens -> seqs 0,1 full; shard b: 32 -> seqs 0,1 full
        assert list(by["a"].seq_id) == [0, 1] and (by["a"].n_tokens == CAP).all()
        assert list(by["b"].seq_id) == [0, 1] and (by["b"].n_tokens == CAP).all()
