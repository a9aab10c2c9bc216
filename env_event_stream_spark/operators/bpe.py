"""Distributed BPE merge learning (Sennrich et al. 2016) — the
tokenizer-training step of an LLM data pipeline, run the way real
tokenizer trainers do: on the WORD-FREQUENCY table, not the raw
corpus.

Scale shape: the corpus shuffles exactly once (the word-count
groupBy); every training iteration after that touches only the
|vocab| rows of the frequency table — an adjacent-pair explode, one
map-side-combined aggregation, and a single 1-row collect (the
winning pair IS the model update, the one driver-side
materialization). Merges are applied row-locally (a Catalyst
aggregate fold); lineage is truncated per iteration with
localCheckpoint so k rounds never stack k expression trees (the
transitive-closure lesson from operators/graph.py).

Everything is integer math over exact token strings — no float
anywhere — so a pure-Python reference trainer (learn_merges_py, used
by the DuckDB-side lazy oracle) must reproduce the distributed result
bit-for-bit: pair weights are exact BIGINT sums and the winner is
chosen by the total order (weight DESC, left ASC, right ASC). Unlike
the k-means-family models (where both sides must SHARE one float
trainer — see NEXT.md invariants), the two BPE trainers are kept
deliberately independent: their agreement is the check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["learn_merges", "learn_merges_py", "merge_pair", "apply_merges_py"]


def apply_merges_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Encode one word with a learned merge table: split to chars,
    apply each merge greedily left-to-right in rank order — the
    standard (rank-ordered, not priority-queue) BPE apply. Shared by
    the Spark row-local encoder and the oracle side (the TRAINERS are
    independent — see module docstring — but the applier is one code
    path, the _pq_kmeans sharing pattern)."""
    sym = list(word)
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def merge_pair(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent
    (a, b) -> a||b in a symbol array — the standard BPE apply step
    ('aaa' + (a,a) -> [aa, a]). A single sequential fold: the merged
    token a||b can never equal the left symbol a (it is strictly
    longer), so 'did the last element just get merged' needs no flag —
    a fresh merge can't chain into another."""
    la, lb = F.lit(a), F.lit(b)
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_merges(
    words: DataFrame,
    k: int,
    *,
    word_col: str = "word",
    freq_col: str = "freq",
) -> list[tuple[int, str, str, int]]:
    """Learn the first ``k`` BPE merges from a word-frequency table.
    Returns [(rank, left, right, weight)] where weight is the exact
    summed frequency of the winning adjacent pair at that round.
    Adjacent pairs are counted with overlaps (every i, i+1 position —
    the Sennrich/HF counting convention); application is greedy
    left-to-right."""
    # lazy checkpoints throughout the loop (r16, guide §2.6): each
    # round's ONE action — the top-pair collect — materializes the
    # previous round's checkpoint as it scans it, so lineage is still
    # truncated per round and compute-once still holds, but the k
    # eager-checkpoint jobs (plus one for the final never-read
    # checkpoint) disappear: 2k+1 synchronous driver barriers -> k.
    syms = words.select(
        F.col(freq_col).cast("bigint").alias("freq"),
        F.expr(f"filter(split({word_col}, ''), x -> x <> '')").alias("syms"),
    ).localCheckpoint(eager=False)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, k + 1):
        # sequence(1, n) DESCENDS when n < 1 — gate on size >= 2
        pairs = syms.where(F.size("syms") >= 2).select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i-1] AS a, syms[i] AS b))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("w"))
            .orderBy(F.col("w").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, w = top[0]["a"], top[0]["b"], int(top[0]["w"])
        merges.append((rank, a, b, w))
        syms = syms.withColumn("syms", merge_pair(F.col("syms"), a, b))
        syms = syms.localCheckpoint(eager=False)
    return merges


def learn_merges_py(
    word_freqs: dict[str, int], k: int
) -> list[tuple[int, str, str, int]]:
    """Pure-Python reference trainer (drives the lazy DuckDB oracle).
    Same counting convention, same greedy apply, same (weight DESC,
    left ASC, right ASC) winner order — kept implementation-
    independent from the Spark path on purpose; see module
    docstring."""
    table = [(list(w), int(f)) for w, f in sorted(word_freqs.items()) if w]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, k + 1):
        pc: dict[tuple[str, str], int] = {}
        for sym, f in table:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pc[p] = pc.get(p, 0) + f
        if not pc:
            break
        (a, b), w = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, w))
        nxt = []
        for sym, f in table:
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt.append((out, f))
        table = nxt
    return merges
