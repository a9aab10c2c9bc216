"""Distributed unigram-LM subword trainer (SentencePiece-style,
Kudo 2018) — the tokenizer-training rung above BPE: instead of greedy
merges, learn a PROBABILISTIC piece vocabulary by EM over word
segmentations, then segment by Viterbi (the min-cost path through
the piece lattice).

This is hard-EM (Viterbi-EM): the E-step assigns each distinct word
its single best segmentation under the current piece costs, the
M-step re-estimates piece counts from those segmentations (+1
add-one smoothing so an unused piece never hits log 0), with one
SentencePiece-style prune after the first iteration (keep all single
chars — the coverage guarantee — plus the top multis). Soft-EM's
forward-backward expected counts are float-order-sensitive and would
never survive a cross-engine hash; hard-EM's E-step is an integer
shortest-path and its M-step an integer sum — the same
integer-quantized-iteration treatment as operators/graph.pagerank_int
and the distributed Lloyd in ann_queries.emb_kmeans_lloyd.

INTEGER DISCIPLINE: piece costs are integer MICRO-NATS, quantized
once per iteration on the DRIVER from the vocab-sized count table
(cost = floor(-ln(c/T)*1e6 + 0.5) — one float op per piece per
iteration, on the driver only, never re-derived per row or per
engine); every executor-side comparison and every oracle-side
comparison is then pure integer arithmetic over the SAME quantized
model, so ties break identically everywhere. Viterbi ties break on
the SMALLEST split start (= longest last piece), scanned in a fixed
ascending order.

Scale shape (100 TB): the corpus shuffles ONCE into the distinct
word-frequency table (Heaps-law sublinear — the BPE trainer's
substrate, operators/bpe.py); seeding is one substring explode +
map-side-combined agg over that table; each EM iteration is one
Arrow mapInPandas pass over it (the vocab-sized cost dict rides the
closure = a broadcast) followed by one vocab-keyed agg; the driver
only ever materializes the <= (alphabet + SEED_MULTI)-row model.
Python touches whole WORDS, never corpus rows.

TWO INDEPENDENT TRAINERS (the operators/bpe.py discipline, not the
shared-float-trainer kmeans discipline — everything here is integer,
so independence is affordable and their agreement is the check):
``train_unigram_lm`` is the distributed Spark trainer with an
ITERATIVE bottom-up Viterbi; ``train_unigram_lm_py`` is a pure
dict-loop Python trainer with a MEMOIZED top-down Viterbi. Both must
produce the bit-identical final model; a hypothesis fuzz pins the
two Viterbi implementations against each other on random vocabs.

Reference analog: none (the reference ships no tokenizer training);
SURVEY §2.11 LLM-pipeline extension, the last unclaimed trainer rung
named in NEXT.md / VERDICT r9 task 4.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ULM_MAX_PIECE",
    "ULM_SEED_MULTI",
    "ULM_KEEP_MULTI",
    "ULM_ITERS",
    "ULM_SCALE",
    "quant_cost",
    "viterbi_iter",
    "viterbi_rec",
    "train_unigram_lm",
    "train_unigram_lm_py",
]

ULM_MAX_PIECE = 8  # max piece length (= max word length in corpus)
ULM_SEED_MULTI = 40  # seed vocabulary: top-40 multi-char substrings
ULM_KEEP_MULTI = 24  # post-prune: keep top-24 multis (+ all chars)
ULM_ITERS = 3  # hard-EM iterations
ULM_SCALE = 1_000_000  # integer micro-nat cost scale


def quant_cost(count: int, total: int) -> int:
    """count/total probability -> integer micro-nat cost.
    floor(x + 0.5) rather than round() (banker's rounding is
    tie-UNSTABLE across float reprs); one libm ln on the DRIVER."""
    return int(math.floor(-math.log(count / total) * ULM_SCALE + 0.5))


def viterbi_iter(
    word: str, costs: dict, max_piece: int = ULM_MAX_PIECE
) -> list[str] | None:
    """ENGINE-side Viterbi: iterative bottom-up DP. dp[j] = min cost
    of segmenting word[:j]; ties -> smallest split start i (= the
    LONGEST last piece), enforced by ascending-i scan with a strict
    '<'. Returns the piece list, or None if some character is not in
    the vocabulary (the caller decides whether that is loud)."""
    n = len(word)
    dp = [0] + [None] * n
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        best = None
        bi = -1
        for i in range(max(0, j - max_piece), j):
            if dp[i] is None:
                continue
            c = costs.get(word[i:j])
            if c is None:
                continue
            cand = dp[i] + c
            if best is None or cand < best:
                best = cand
                bi = i
        dp[j] = best
        back[j] = bi
    if dp[n] is None:
        return None
    pieces: list[str] = []
    j = n
    while j > 0:
        i = back[j]
        pieces.append(word[i:j])
        j = i
    pieces.reverse()
    return pieces


def viterbi_rec(
    word: str, costs: dict, max_piece: int = ULM_MAX_PIECE
) -> list[str] | None:
    """ORACLE-side Viterbi: memoized top-down demand-driven
    evaluation — a deliberately different mechanization of the same
    contract (min cost, ties -> smallest split start). The recursion
    is simulated with an explicit work stack so a single
    1000+-char token (a base64/URL blob in a dirty corpus) cannot
    blow Python's recursion limit while its twin viterbi_iter
    handles the same word fine — the two mechanizations must share
    their DOMAIN, not just their answers (review-pass catch).
    Fuzz-pinned against viterbi_iter in tests/test_unigram_lm.py,
    including a long-token case."""
    n = len(word)
    memo: dict[int, tuple[int, int] | None] = {0: (0, -1)}
    stack = [n]
    while stack:
        j = stack[-1]
        if j in memo:
            stack.pop()
            continue
        lo = max(0, j - max_piece)
        pending = [i for i in range(lo, j) if i not in memo]
        if pending:
            stack.extend(pending)
            continue
        best = None
        for i in range(lo, j):
            fi = memo[i]
            if fi is None:
                continue
            c = costs.get(word[i:j])
            if c is None:
                continue
            cand = fi[0] + c
            if best is None or cand < best[0]:
                best = (cand, i)
        memo[j] = best
        stack.pop()
    if memo[n] is None:
        return None
    pieces: list[str] = []
    j = len(word)
    while j > 0:
        i = memo[j][1]
        pieces.append(word[i:j])
        j = i
    pieces.reverse()
    return pieces


def _finalize(counts_raw: dict, vocab: list[str]) -> list[tuple]:
    """Shared readout shape: (piece, piece_len, count, prob_ppm,
    cost_micronat) rows in piece order. counts are the RAW final
    Viterbi counts; prob/cost use the +1-smoothed distribution the
    next E-step would see — the published model."""
    total = sum(counts_raw.get(p, 0) + 1 for p in vocab)
    out = []
    for p in sorted(vocab):
        c = counts_raw.get(p, 0)
        out.append(
            (
                p,
                len(p),
                c,
                (c + 1) * 1_000_000 // total,
                quant_cost(c + 1, total),
            )
        )
    return out


def train_unigram_lm(words: DataFrame) -> list[tuple]:
    """Distributed hard-EM trainer over a (word, freq) DataFrame.
    Returns the final model as _finalize rows. See module docstring
    for the scale shape; the only driver materializations are the
    seed table, and one vocab-sized count table per iteration."""
    w = (
        words.select(
            F.col("word").cast("string").alias("word"),
            F.col("freq").cast("bigint").alias("freq"),
        )
        # drop the empty token a whitespace split of an empty text
        # yields: it carries nothing segmentable, and Spark's
        # sequence(1, 0) DESCENDS (it would emit phantom ''-pieces
        # the pure-Python trainer never sees) — both trainers drop
        # it, so they stay in lockstep on any input
        .where(F.length("word") >= 1)
        .localCheckpoint(eager=True)
    )

    # --- seed: every substring of every word, weighted by word freq,
    # counted at EVERY start position (overlaps included) — one
    # row-local explode + one map-side-combined agg
    subs = w.select(
        "freq",
        F.explode(
            F.expr(
                f"flatten(transform("
                f"  sequence(1, least(length(word), {ULM_MAX_PIECE})),"
                f"  L -> transform(sequence(1, length(word) - L + 1),"
                f"       s -> substring(word, s, L))))"
            )
        ).alias("piece"),
    ).groupBy("piece").agg(F.sum("freq").alias("tot"))
    chars = [
        (r["piece"], int(r["tot"]))
        for r in subs.where(F.length("piece") == 1).collect()
    ]
    multis = [
        (r["piece"], int(r["tot"]))
        for r in subs.where(F.length("piece") >= 2)
        .orderBy(F.col("tot").desc(), F.col("piece").asc())
        .limit(ULM_SEED_MULTI)
        .collect()
    ]
    counts = dict(chars) | dict(multis)
    char_set = {c for c, _ in chars}

    def e_step(costs: dict) -> dict:
        """One distributed E-step: Viterbi-segment every distinct
        word (Arrow batches; the cost dict rides the closure), emit
        (piece, freq) per use, agg per piece, collect vocab-sized."""
        from typing import Iterator

        import pandas as pd

        def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for word, freq in zip(pdf["word"], pdf["freq"]):
                    pieces = viterbi_iter(word, costs)
                    if pieces is None:  # impossible: chars are seeded
                        raise ValueError(
                            f"unigram_lm: unsegmentable word {word!r}"
                        )
                    for p in pieces:
                        out.append((p, int(freq)))
                yield pd.DataFrame(
                    out, columns=["piece", "n"]
                ).astype({"piece": "string", "n": "int64"})

        rows = (
            w.mapInPandas(seg, "piece string, n bigint")
            .groupBy("piece")
            .agg(F.sum("n").alias("n"))
            .collect()
        )
        return {r["piece"]: int(r["n"]) for r in rows}

    for it in range(ULM_ITERS):
        total = sum(counts.values())
        costs = {p: quant_cost(c, total) for p, c in counts.items()}
        raw = e_step(costs)
        if it == 0:
            # SentencePiece-style prune: all single chars (coverage)
            # + the top multis by smoothed count, piece-asc ties
            kept = sorted(
                (p for p in counts if len(p) >= 2),
                key=lambda p: (-(raw.get(p, 0) + 1), p),
            )[:ULM_KEEP_MULTI]
            vocab = sorted(char_set | set(kept))
        else:
            vocab = sorted(counts)
        counts = {p: raw.get(p, 0) + 1 for p in vocab}
    final_raw = {p: counts[p] - 1 for p in vocab}
    return _finalize(final_raw, vocab)


def train_unigram_lm_py(word_freq: dict) -> list[tuple]:
    """Pure-Python reference trainer — independent implementation
    (dict loops + the memoized top-down Viterbi). Must reproduce
    train_unigram_lm bit-for-bit; their agreement is the check."""
    # identical empty-token drop as the distributed trainer (see its
    # inline comment) — lockstep on any input, not just clean corpora
    word_freq = {w: f for w, f in word_freq.items() if len(w) >= 1}
    counts: dict[str, int] = {}
    char_set: set[str] = set()
    for word, freq in word_freq.items():
        for ch in word:
            char_set.add(ch)
        n = len(word)
        for L in range(1, min(ULM_MAX_PIECE, n) + 1):
            for s in range(0, n - L + 1):
                p = word[s : s + L]
                counts[p] = counts.get(p, 0) + freq
    multis = sorted(
        ((p, c) for p, c in counts.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:ULM_SEED_MULTI]
    counts = {c: counts[c] for c in char_set} | dict(multis)

    vocab = sorted(counts)
    for it in range(ULM_ITERS):
        total = sum(counts.values())
        costs = {p: quant_cost(c, total) for p, c in counts.items()}
        raw: dict[str, int] = {}
        for word, freq in word_freq.items():
            pieces = viterbi_rec(word, costs)
            if pieces is None:
                raise ValueError(
                    f"unigram_lm_py: unsegmentable word {word!r}"
                )
            for p in pieces:
                raw[p] = raw.get(p, 0) + freq
        if it == 0:
            kept = sorted(
                (p for p in counts if len(p) >= 2),
                key=lambda p: (-(raw.get(p, 0) + 1), p),
            )[:ULM_KEEP_MULTI]
            vocab = sorted(char_set | set(kept))
        else:
            vocab = sorted(counts)
        counts = {p: raw.get(p, 0) + 1 for p in vocab}
    final_raw = {p: counts[p] - 1 for p in vocab}
    return _finalize(final_raw, vocab)
