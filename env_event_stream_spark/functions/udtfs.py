"""Python UDTFs (SURVEY.md §2.10 GAP — the reference has no table
functions at all).

For set-returning logic Spark's built-ins cover almost everything via
explode/posexplode (see func_explode_token_freq) — these UDTFs are
the escape hatch for logic that genuinely needs imperative row
generation. Both are LATERAL-joinable and arrow-batched by the
engine.

Registration: ``register_udtfs(spark)`` → SQL
``SELECT t.* FROM events, LATERAL json_kv(props) t``.
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf

__all__ = ["NgramsUDTF", "JsonKvUDTF", "register_udtfs"]


@udtf(returnType="pos int, ngram string")
class NgramsUDTF:
    """Emit (position, word-n-gram) rows for a text value. The n is
    passed per call: ``ngrams(text, 3)``."""

    def eval(self, text: str, n: int):  # noqa: D102
        if not text or n is None or n < 1:
            return
        toks = text.split()
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


@udtf(returnType="key string, value string")
class JsonKvUDTF:
    """Flatten a one-level JSON object column into (key, value) rows
    (the JSONB-path surface of the reference's Postgres DLQ,
    src/deadletter.ts:368-378, generalized to arbitrary keys)."""

    def eval(self, doc: str):  # noqa: D102
        if not doc:
            return
        try:
            obj = json.loads(doc)
        except (ValueError, TypeError):
            return
        if not isinstance(obj, dict):
            return
        for k in sorted(obj):
            v = obj[k]
            yield k, json.dumps(v) if isinstance(v, (dict, list)) else str(v)


def register_udtfs(spark) -> None:
    spark.udtf.register("ngrams", NgramsUDTF)
    spark.udtf.register("json_kv", JsonKvUDTF)
