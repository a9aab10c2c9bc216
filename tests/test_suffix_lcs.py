"""Suffix-automaton LCS rung: the two deliberately independent
implementations (engine automaton vs oracle binary-search/set probe)
fuzzed against each other, the contract's occurrence properties, and
the catalog query's end-to-end consistency with the raw texts."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from env_event_stream_spark.operators.suffix import (
    lcs_bisect,
    suffix_automaton_lcs,
)

# small alphabets force long repeated substrings and clone-heavy
# automata — the construction's hard paths
_texts = st.text(alphabet="abc", max_size=60)


@given(_texts, _texts)
@settings(max_examples=400, deadline=None)
def test_lcs_two_implementations_agree(a, b):
    assert suffix_automaton_lcs(a, b) == lcs_bisect(a, b)


@given(_texts, _texts)
@settings(max_examples=200, deadline=None)
def test_lcs_contract_properties(a, b):
    ln, sa, sb = suffix_automaton_lcs(a, b)
    if ln == 0:
        assert (sa, sb) == (-1, -1)
        assert not set(a) & set(b)
        return
    sub = b[sb : sb + ln]
    # the reported substring really occurs at both reported positions
    assert a[sa : sa + ln] == sub
    # start_a is the FIRST occurrence in a, start_b the first in b
    assert a.find(sub) == sa
    assert all(b[j : j + ln] not in a for j in range(sb))
    # maximality: no common substring is longer (via the independent
    # existence probe)
    assert lcs_bisect(a, b)[0] == ln


def test_lcs_pairs_rows_check_against_texts(spark, sf_dir):
    import pyarrow.parquet as pq

    from env_event_stream_spark.llm_queries import (
        _LCS_SEED,
        doc_lcs_pairs,
    )

    rows = doc_lcs_pairs(spark, sf_dir).collect()
    assert rows, "no LCS pairs at test sf"
    t = pq.read_table(
        sf_dir.rstrip("/") + "/documents.parquet",
        columns=["doc_id", "text"],
    )
    texts = dict(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    )
    for r in rows:
        a, b = texts[r["id_a"]], texts[r["id_b"]]
        ln = r["lcs_len"]
        # seed completeness floor: every proposed pair shares >= 24
        assert ln >= _LCS_SEED
        sub = b[r["start_b"] : r["start_b"] + ln]
        assert a[r["start_a"] : r["start_a"] + ln] == sub
        # byte-exact maximality, independently re-derived
        assert lcs_bisect(a, b)[0] == ln


def test_lcs_scrub_reassembles_engine_spans(spark, sf_dir):
    # the JVM-side interval-merge + aggregate() cut must equal an
    # independent Python scrub over the ENGINE's own pair spans —
    # pins the declarative reassembly (the part the VALUES oracle
    # shares a span source with) against a second implementation
    import hashlib

    import pyarrow.parquet as pq

    from env_event_stream_spark.llm_queries import (
        doc_lcs_pairs,
        doc_lcs_scrub,
    )

    spans: dict = {}
    for r in doc_lcs_pairs(spark, sf_dir).collect():
        spans.setdefault(r["id_b"], []).append(
            (r["start_b"], r["start_b"] + r["lcs_len"])
        )
    assert spans, "no LCS pairs at test sf"
    t = pq.read_table(
        sf_dir.rstrip("/") + "/documents.parquet",
        columns=["doc_id", "text"],
    )
    texts = dict(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    )
    want = {}
    for d, ss in spans.items():
        merged: list = []
        for s, e in sorted(ss):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        txt = texts[d]
        clean = ""
        pos = removed = 0
        for s, e in merged:
            clean += txt[pos:s]
            removed += e - s
            pos = e
        clean += txt[pos:]
        want[d] = (
            len(txt),
            len(merged),
            removed,
            hashlib.md5(clean.encode("utf-8")).hexdigest(),
        )
    got = {
        r["doc_id"]: (
            r["n_chars"],
            r["n_spans"],
            r["n_removed"],
            r["clean_hash"],
        )
        for r in doc_lcs_scrub(spark, sf_dir).collect()
    }
    assert got == want
