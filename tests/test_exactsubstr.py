"""Exact-substring dedup + surgical scrub: cross-checked against an
independent pure-Python reference over the real sf0.001 corpus (the
oracle proves Spark ≡ DuckDB; these prove both ≡ the intended
semantics)."""

from __future__ import annotations

import hashlib
import re

from env_event_stream_spark.catalog import QUERIES
from env_event_stream_spark.llm_queries import _SEED_N


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", text.strip())


def _longest_common_run(a: list[str], b: list[str]):
    """O(|a|·|b|) DP for the longest common contiguous run; returns
    (length, start_a, start_b) with the smallest-start tie-break the
    query contracts."""
    best = (0, 0, 0)
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                cand = (cur[j], i - cur[j], j - cur[j])
                if cand[0] > best[0] or (
                    cand[0] == best[0]
                    and (cand[1], cand[2]) < (best[1], best[2])
                ):
                    best = cand
        prev = cur
    return best


def test_exactsubstr_matches_python_dp(spark, sf_dir):
    docs = {
        r.doc_id: _toks(r.text)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    rows = QUERIES["doc_exactsubstr_spans"](spark, sf_dir).collect()
    assert rows, "corpus has near-dups; the query must find them"
    seen = set()
    for r in rows:
        seen.add((r.id_a, r.id_b))
        a, b = docs[r.id_a], docs[r.id_b]
        length, sa, sb = _longest_common_run(a, b)
        assert length >= _SEED_N
        assert (r.lcs_tokens, r.start_a, r.start_b) == (length, sa, sb), (
            r.id_a,
            r.id_b,
        )
        # the reported span really is identical text on both sides
        assert (
            a[r.start_a : r.start_a + r.lcs_tokens]
            == b[r.start_b : r.start_b + r.lcs_tokens]
        )

    # completeness: every pair sharing a seed gram is reported
    gram_index: dict[tuple, set[int]] = {}
    for did, tk in docs.items():
        for i in range(len(tk) - _SEED_N + 1):
            gram_index.setdefault(tuple(tk[i : i + _SEED_N]), set()).add(did)
    expected = set()
    for ids in gram_index.values():
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                expected.add((ids[x], ids[y]))
    assert seen == expected


def test_scrub_matches_python_reference(spark, sf_dir):
    docs = {
        r.doc_id: _toks(r.text)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    eval_shingles = set()
    for did, tk in docs.items():
        if did % 97 == 0:
            for i in range(len(tk) - 2):
                eval_shingles.add(tuple(tk[i : i + 3]))
    rows = QUERIES["doc_scrub_contamination"](spark, sf_dir).collect()
    expected_ids = set()
    for did, tk in docs.items():
        if did % 97 == 0:
            continue
        if any(
            tuple(tk[i : i + 3]) in eval_shingles for i in range(len(tk) - 2)
        ):
            expected_ids.add(did)
    assert {r.doc_id for r in rows} == expected_ids
    by_id = {r.doc_id: r for r in rows}
    for did in expected_ids:
        tk = docs[did]
        rm = set()
        for i in range(len(tk) - 2):
            if tuple(tk[i : i + 3]) in eval_shingles:
                rm.update((i, i + 1, i + 2))
        kept = [t for j, t in enumerate(tk) if j not in rm]
        r = by_id[did]
        assert r.n_tokens == len(tk)
        assert r.n_removed == len(rm)
        assert r.n_removed >= 3
        expect_hash = hashlib.md5(" ".join(kept).encode()).hexdigest()
        assert r.clean_hash == expect_hash, did


def test_token_yield_partitions_and_rescue(spark, sf_dir):
    """Yield report consistency: statuses partition each source's
    docs; kept-token mass bounds; and the scrub policy rescues a
    positive token mass on this corpus (there ARE contaminated docs
    that quality/dup would otherwise keep)."""
    rows = QUERIES["doc_pretrain_token_yield"](spark, sf_dir).collect()
    assert rows
    assert sum(r.n_docs for r in rows) == (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id % 97 != 0")
        .count()
    )
    for r in rows:
        assert r.n_dropped + r.n_scrubbed + r.n_clean == r.n_docs
        assert 0 <= r.tokens_rescued <= r.tokens_kept
    assert sum(r.tokens_rescued for r in rows) > 0
