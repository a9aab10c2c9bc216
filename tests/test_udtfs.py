"""Python UDTF surface (§2.10 GAP)."""

from __future__ import annotations

from env_event_stream_spark.functions.udtfs import register_udtfs


def test_ngrams_udtf_lateral(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b c d"), (2, "x y"), (3, None)], "id bigint, txt string"
    ).createOrReplaceTempView("docs_u")
    rows = spark.sql(
        "SELECT id, t.pos, t.ngram FROM docs_u, LATERAL ngrams(txt, 3) t "
        "ORDER BY id, pos"
    ).collect()
    assert [(r.id, r.pos, r.ngram) for r in rows] == [
        (1, 0, "a b c"),
        (1, 1, "b c d"),
    ]


def test_json_kv_udtf(spark, sf_dir):
    register_udtfs(spark)
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(20).createOrReplaceTempView(
        "ev_u"
    )
    rows = spark.sql(
        "SELECT event_id, t.key, t.value FROM ev_u, LATERAL json_kv(props) t"
    ).collect()
    assert len(rows) > 0
    assert all(r.key for r in rows)


def test_json_kv_malformed_is_skipped(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "{bad json"), (2, '{"a": 1}'), (3, "[1,2]")], "id bigint, j string"
    ).createOrReplaceTempView("js_u")
    rows = spark.sql(
        "SELECT id, t.key, t.value FROM js_u, LATERAL json_kv(j) t"
    ).collect()
    assert [(r.id, r.key, r.value) for r in rows] == [(2, "a", "1")]
