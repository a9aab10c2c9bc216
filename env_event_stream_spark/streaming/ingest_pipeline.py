"""The training-data ingest front door: one composed streaming
pipeline that annotates and routes arriving documents.

Stages (all stateless → append-mode safe, unbounded-stream safe):

1. quality signals  (functions/text.py quality_metrics — per-row
   Catalyst expressions)
2. repetition ratio (functions/text.py ngram_repetition)
3. contamination    (streaming/dedup_stream.py contamination_gate —
   broadcast eval-vocabulary intersect)
4. optional learned quality filter (operators/classifier.py
   quality_logit_column — the trained logistic as one literal-array
   expression; still stateless)
5. routing verdict  — 'pass' | 'low_quality' | 'model_reject' |
   'contaminated',
   mirroring the reference's publish gate routing invalid events to
   the DLQ instead of failing the stream (src/topic.ts:103-110,
   src/subscription.ts:100-104): bad documents are DATA, not errors.

Every stage is a column annotation, so the whole pipeline is ONE
projection over the stream — zero shuffles, zero state stores; at
100 TB/day ingest the cost is a single pass of per-row expressions
plus a constant broadcast probe.

Route the output with two filters into keep/quarantine sinks; both
remain append-mode streaming writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from env_event_stream_spark.functions.text import (
    ngram_repetition,
    quality_metrics,
    tokens,
)
from env_event_stream_spark.streaming.dedup_stream import contamination_gate

__all__ = ["document_ingest_pipeline"]


def document_ingest_pipeline(
    docs: DataFrame,
    eval_df: DataFrame,
    *,
    text_col: str = "text",
    min_tokens: int = 5,
    max_rep_ratio: float = 0.3,
    min_shared: int = 1,
    model: tuple[list[float], float] | None = None,
) -> DataFrame:
    """Annotate a document stream with quality + contamination signals
    and a routing verdict. Works identically on batch frames (for
    backfill) — same code path, the stream/table duality §1.2."""
    m = quality_metrics(F.col(text_col))
    with_tokens = docs.withColumn("_tk", tokens(F.col(text_col)))
    total, uniq = ngram_repetition(F.col("_tk"), 3)
    annotated = (
        with_tokens.withColumn("n_tokens", m["n_tokens"])
        .withColumn(
            "rep_ratio",
            F.when(total > 0, F.lit(1.0) - uniq / total).otherwise(F.lit(0.0)),
        )
        .drop("_tk")
    )
    gated = contamination_gate(
        annotated, eval_df, text_col=text_col, min_shared=min_shared
    )
    if model is not None:
        from env_event_stream_spark.operators.classifier import (
            quality_logit_column,
        )

        weights, bias = model
        gated = gated.withColumn(
            "model_keep",
            quality_logit_column(F.col(text_col), weights, bias) >= 0,
        )
    else:
        gated = gated.withColumn("model_keep", F.lit(True))
    return gated.withColumn(
        "verdict",
        F.when(F.col("contaminated"), F.lit("contaminated"))
        .when(
            (F.col("n_tokens") < min_tokens)
            | (F.col("rep_ratio") > max_rep_ratio),
            F.lit("low_quality"),
        )
        .when(~F.col("model_keep"), F.lit("model_reject"))
        .otherwise(F.lit("pass")),
    )
