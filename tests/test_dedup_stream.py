"""Incremental near-dup index across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from env_event_stream_spark.streaming.dedup_stream import IncrementalNearDupIndex

_DOC_A = "the quick brown fox jumps over the lazy dog again and again"
_DOC_B = "completely different content about spark and parquet tables here"
_DOC_A2 = "the quick brown fox jumps over the lazy dog again and again"  # dup of A
_DOC_C = "yet another unrelated piece of text with its own words entirely"


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_cross_batch_duplicate_detected(spark, tmp_path):
    ix = IncrementalNearDupIndex(
        spark, str(tmp_path / "index"), str(tmp_path / "pairs")
    )
    ix.apply_batch(_batch(spark, [(1, _DOC_A), (2, _DOC_B)]))
    assert ix.pairs_df().count() == 0  # batch 1: no dups

    ix.apply_batch(_batch(spark, [(3, _DOC_A2), (4, _DOC_C)]))
    pairs = {(r.new_id, r.old_id) for r in ix.pairs_df().collect()}
    assert (3, 1) in pairs  # the cross-batch duplicate
    assert not any(p for p in pairs if 4 in p or 2 in p)  # uniques stay clean


def test_intra_batch_duplicate_detected(spark, tmp_path):
    ix = IncrementalNearDupIndex(
        spark, str(tmp_path / "ix2"), str(tmp_path / "p2")
    )
    ix.apply_batch(_batch(spark, [(10, _DOC_A), (11, _DOC_A2), (12, _DOC_B)]))
    pairs = {(r.new_id, r.old_id) for r in ix.pairs_df().collect()}
    assert pairs == {(11, 10)}


def test_index_grows_and_streams(spark, tmp_path):
    """Driven by a real streaming query through the idempotent sink."""
    from env_event_stream_spark.streaming.sinks import IdempotentBatchSink

    src = str(tmp_path / "src")
    ix = IncrementalNearDupIndex(
        spark, str(tmp_path / "ix3"), str(tmp_path / "p3")
    )
    sink = IdempotentBatchSink(str(tmp_path / "commits"), ix.apply_batch)

    _batch(spark, [(1, _DOC_A), (2, _DOC_B)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = (
        spark.readStream.schema("doc_id bigint, text string").parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert ix.index_df().select("doc_id").distinct().count() == 2

    _batch(spark, [(3, _DOC_A2)]).coalesce(1).write.mode("append").parquet(src)
    q = (
        spark.readStream.schema("doc_id bigint, text string").parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    pairs = {(r.new_id, r.old_id) for r in ix.pairs_df().collect()}
    assert (3, 1) in pairs


def test_contamination_gate_stream_matches_batch(spark, tmp_path):
    """Streaming gate (stateless broadcast intersect) agrees with the
    batch contamination_hits counts, running append-mode with no
    watermark or state."""
    from env_event_stream_spark.operators.dedup import contamination_hits
    from env_event_stream_spark.streaming.dedup_stream import contamination_gate

    schema = "doc_id bigint, text string"
    docs = [
        (1, "a b c d e"),
        (2, "c d e f g"),
        (3, "x y z w v"),
        (4, "a b"),  # shorter than n — never contaminated
    ]
    eval_rows = [(100, "b c d e f")]
    src = str(tmp_path / "docs")
    spark.createDataFrame(docs, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    eval_df = spark.createDataFrame(eval_rows, schema)

    stream = spark.readStream.schema(schema).parquet(src)
    gated = contamination_gate(stream, eval_df)
    q = (
        gated.writeStream.format("memory")
        .queryName("gate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.n_shared, r.contaminated)
        for r in spark.table("gate").collect()
    }

    batch = {
        r.doc_id: r.n_shared
        for r in contamination_hits(
            spark.createDataFrame(docs, schema), eval_df, "text", "doc_id"
        ).collect()
    }
    assert set(got) == {1, 2, 3, 4}  # gate annotates every row
    for doc_id, (n_shared, flag) in got.items():
        assert n_shared == batch.get(doc_id, 0)
        assert flag == (doc_id in batch)


def test_document_ingest_pipeline_routes(spark, tmp_path):
    """Composed ingest front door: quality + contamination + verdict
    in one stateless pass; runs append-mode on a stream and routes
    each class correctly."""
    from env_event_stream_spark.streaming.ingest_pipeline import (
        document_ingest_pipeline,
    )

    schema = "doc_id bigint, text string"
    docs = [
        (1, "quick brown foxes jump over lazy dogs daily"),  # pass
        (2, "too short"),                                    # low_quality (tokens)
        (3, "spam spam spam spam spam spam spam spam spam spam"),  # low_quality (rep)
        (4, "held out benchmark sentence appears verbatim here today"),  # contaminated
    ]
    eval_df = spark.createDataFrame(
        [(100, "held out benchmark sentence appears verbatim")], schema
    )
    src = str(tmp_path / "docs")
    spark.createDataFrame(docs, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = document_ingest_pipeline(stream, eval_df)
    q = (
        out.writeStream.format("memory")
        .queryName("ingest")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: r.verdict for r in spark.table("ingest").collect()}
    assert got == {
        1: "pass",
        2: "low_quality",
        3: "low_quality",
        4: "contaminated",
    }

    # batch backfill takes the identical code path
    batch = document_ingest_pipeline(
        spark.createDataFrame(docs, schema), eval_df
    )
    assert {r.doc_id: r.verdict for r in batch.collect()} == got


def test_ingest_pipeline_model_gate_streaming(spark, tmp_path):
    """The learned quality filter rides the ingest projection as a
    stateless expression: train on a labeled sample, then verify a
    STREAMING pass routes model-rejected docs to 'model_reject' while
    clean docs still 'pass' — and that the plan stays append-safe
    (no state store, the stream runs in append mode)."""
    from env_event_stream_spark.operators.classifier import (
        train_quality_classifier,
    )
    from env_event_stream_spark.streaming.ingest_pipeline import (
        document_ingest_pipeline,
    )

    good = (
        "the quick brown fox jumps over a lazy dog and runs far away "
        "with the pack of hounds chasing it through fields of grain"
    )
    bad = "zz9 $$!! ##"
    model = train_quality_classifier(
        [(i, good + f" x{i}") if i % 2 else (i, bad + str(i)) for i in range(80)]
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, good + " fresh"), (2, bad + " new")], "doc_id bigint, text string"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    eval_df = spark.createDataFrame(
        [("completely unrelated evaluation text",)], "text string"
    )
    out = document_ingest_pipeline(
        stream, eval_df, min_tokens=1, model=model
    )
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = {r.doc_id: r for r in spark.read.parquet(sink).collect()}
    assert rows[1].verdict == "pass" and rows[1].model_keep is True
    assert rows[2].verdict == "model_reject" and rows[2].model_keep is False
