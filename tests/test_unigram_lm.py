"""Unigram-LM subword trainer (operators/unigram_lm.py): the two
independent Viterbi mechanizations fuzz-pinned against each other,
the two independent trainers pinned bit-for-bit on real word counts,
and the model's contract properties."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from env_event_stream_spark.operators.unigram_lm import (
    ULM_ITERS,
    ULM_KEEP_MULTI,
    ULM_MAX_PIECE,
    quant_cost,
    train_unigram_lm,
    train_unigram_lm_py,
    viterbi_iter,
    viterbi_rec,
)

_words = st.text(alphabet="abcd", min_size=1, max_size=12)


@given(
    _words,
    st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=4),
        st.integers(1, 10_000_000),
        max_size=20,
    ),
)
@settings(max_examples=400, deadline=None)
def test_viterbi_two_mechanizations_agree(word, extra_costs):
    # iterative bottom-up (engine) vs memoized top-down (oracle) on
    # random words and random integer cost tables; single chars get a
    # guaranteed cost so segmentability varies only via extra pieces
    costs = {c: 5_000_000 for c in "abcd"}
    costs.update(extra_costs)
    a = viterbi_iter(word, costs)
    b = viterbi_rec(word, costs)
    assert a == b
    assert a is not None and "".join(a) == word
    # optimality spot-check: the chosen cost never exceeds the
    # all-chars segmentation
    assert sum(costs[p] for p in a) <= sum(costs[c] for c in word)


@given(_words)
@settings(max_examples=100, deadline=None)
def test_viterbi_unsegmentable_returns_none(word):
    # a vocabulary missing some character of the word must yield None
    # from BOTH mechanizations (the trainers then raise loudly)
    costs = {c: 1_000_000 for c in "ab"}
    has_gap = any(c not in costs for c in word)
    a = viterbi_iter(word, costs)
    b = viterbi_rec(word, costs)
    assert a == b
    assert (a is None) == has_gap


@given(
    st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=8),
        st.integers(1, 1000),
        min_size=1,
        max_size=15,
    )
)
@settings(max_examples=60, deadline=None)
def test_py_trainer_contract_on_random_corpora(word_freq):
    model = train_unigram_lm_py(word_freq)
    pieces = {p for p, _, _, _, _ in model}
    chars = {c for w in word_freq for c in w}
    # coverage floor: every corpus char survives every prune
    assert chars <= pieces
    # prune bound: multis capped, pieces bounded by max length
    assert sum(1 for p in pieces if len(p) >= 2) <= ULM_KEEP_MULTI
    assert all(len(p) <= ULM_MAX_PIECE for p in pieces)
    # smoothed probabilities form a (floor-rounded) distribution
    assert sum(ppm for _, _, _, ppm, _ in model) <= 1_000_000
    # cost is the quantization of the smoothed count
    total = sum(c + 1 for _, _, c, _, _ in model)
    for _, _, c, ppm, cost in model:
        assert ppm == (c + 1) * 1_000_000 // total
        assert cost == quant_cost(c + 1, total)
    # the model segments its own corpus (no raise)
    costs = {p: cost for p, _, _, _, cost in model}
    for w in word_freq:
        assert viterbi_iter(w, costs) is not None


def test_distributed_trainer_matches_python_trainer(spark, sf_dir):
    # the bit-for-bit agreement check (the operators/bpe.py
    # discipline): distributed Spark trainer vs the independent pure
    # Python trainer on the same word counts at the test SF
    from env_event_stream_spark.llm_queries import (
        _ulm_words_spark,
    )

    words = {
        r["word"]: int(r["freq"])
        for r in _ulm_words_spark(spark, sf_dir, "full").collect()
    }
    assert words, "no words at test sf"
    m_spark = train_unigram_lm(_ulm_words_spark(spark, sf_dir, "full"))
    m_py = train_unigram_lm_py(words)
    assert m_spark == m_py
    assert ULM_ITERS == 3  # the published iteration count


def test_eval_twin_is_integer_consistent(spark, sf_dir):
    # engine eval row must equal the pure-Python replay exactly, and
    # the per-token division must be floor-consistent with the totals
    from env_event_stream_spark.llm_queries import (
        _ulm_eval_py,
        doc_unigram_lm_eval,
    )

    row = doc_unigram_lm_eval(spark, sf_dir).collect()[0]
    py = _ulm_eval_py(sf_dir)
    assert (
        row["n_test_tokens"],
        row["n_oov_tokens"],
        row["sub_total_micronat"],
        row["word_total_micronat"],
        row["sub_per_token"],
        row["word_per_token"],
        row["winner"],
    ) == py
    assert row["sub_per_token"] == row["sub_total_micronat"] // max(
        row["n_test_tokens"], 1
    )


def test_encode_readout_matches_python_replay(spark, sf_dir):
    # per-source compression readout == a pure-Python recompute from
    # the same model (trainer parity already pinned above), and the
    # structural bounds: a piece covers >= 1 char, so pieces <= chars
    # and pieces >= ws tokens (every word emits >= 1 piece)
    from env_event_stream_spark.llm_queries import (
        _ulm_words_spark,
        doc_unigram_lm_encode,
    )
    from env_event_stream_spark.tables import load_table
    from pyspark.sql import functions as F

    rows = doc_unigram_lm_encode(spark, sf_dir).collect()
    assert rows, "no sources at test sf"
    words = {
        r["word"]: int(r["freq"])
        for r in _ulm_words_spark(spark, sf_dir, "full").collect()
    }
    model = train_unigram_lm_py(words)
    costs = {p: cost for p, _, _, _, cost in model}
    segs = {w: viterbi_rec(w, costs) for w in words}
    d = load_table(spark, sf_dir, "documents")
    bag = (
        d.select("source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    agg: dict = {}
    for r in bag:
        a = agg.setdefault(r["source"], [0, 0, 0, 0])
        a[0] += r["c"]
        a[1] += len(r["w"]) * r["c"]
        a[2] += len(segs[r["w"]]) * r["c"]
        a[3] += r["c"] * sum(costs[p] for p in segs[r["w"]])
    for r in rows:
        a = agg[r["source"]]
        assert (r["n_ws_tokens"], r["n_chars"], r["n_pieces"]) == (
            a[0], a[1], a[2],
        )
        assert r["pieces_per_mchar"] == (
            0 if a[1] == 0 else a[2] * 1_000_000 // a[1]
        )
        assert r["cost_per_piece_micronat"] == (
            0 if a[2] == 0 else a[3] // a[2]
        )
        assert r["n_pieces"] <= r["n_chars"]
        assert r["n_pieces"] >= r["n_ws_tokens"]


def test_prune_eval_matches_replay_and_is_sound(spark, sf_dir):
    # engine prune losses == the pure-Python replay; losses are
    # nonnegative (dropping a piece can only cost); a piece with
    # n_words_using == 0 must report loss 0; and at least one piece
    # carries positive loss at the test SF (the criterion is
    # informative)
    from env_event_stream_spark.llm_queries import (
        _ulm_prune_losses_py,
        _ulm_words_spark,
        doc_unigram_lm_prune_eval,
    )

    rows = doc_unigram_lm_prune_eval(spark, sf_dir).collect()
    assert rows, "no multi pieces at test sf"
    words = {
        r["word"]: int(r["freq"])
        for r in _ulm_words_spark(spark, sf_dir, "full").collect()
    }
    losses = _ulm_prune_losses_py(train_unigram_lm_py(words), words)
    got = {
        r["piece"]: (r["n_words_using"], r["loss_micronat"])
        for r in rows
    }
    assert got == {p: tuple(v) for p, v in losses.items()}
    for r in rows:
        assert r["loss_micronat"] >= 0
        assert r["piece_len"] == len(r["piece"]) and r["piece_len"] >= 2
        if r["n_words_using"] == 0:
            assert r["loss_micronat"] == 0
    assert any(r["loss_micronat"] > 0 for r in rows)


def test_trainers_drop_empty_token_in_lockstep(spark):
    # a whitespace split of an empty text yields '' — both trainers
    # must DROP it identically (Spark's sequence(1, 0) descends and
    # would otherwise emit phantom empty pieces the Python trainer
    # never sees)
    wf = {"": 100, "ab": 3, "b": 2}
    m_py = train_unigram_lm_py(wf)
    assert all(p != "" for p, *_ in m_py)
    words = spark.createDataFrame(
        list(wf.items()), "word string, freq long"
    )
    m_spark = train_unigram_lm(words)
    assert m_spark == m_py


def test_viterbi_rec_survives_long_tokens():
    # the two mechanizations must share their DOMAIN, not just their
    # answers: a single 5000-char token (base64/URL blob in a dirty
    # corpus) must not blow the oracle-side scanner's recursion —
    # both return the same segmentation
    word = "abcd" * 1250
    costs = {c: 5_000_000 for c in "abcd"}
    costs["abcd"] = 1_000_000
    a = viterbi_iter(word, costs)
    b = viterbi_rec(word, costs)
    assert a == b == ["abcd"] * 1250
