"""fastText-style document-quality classifier: logistic regression
over hashed unigram features (the "hashing trick"), trained
deterministically on a bounded lowest-id sample with labels from the
Gopher heuristic rules, scored corpus-wide with the weight vector
broadcast back.

This is the supervised stage every production corpus pipeline runs
after the heuristic rules (CCNet / fastText quality filters): the
rules label a bounded sample, the linear model generalizes the
decision, and scoring is a pure hash + weighted-sum over tokens —
O(tokens) with an O(n_buckets) model no matter the vocabulary.

Determinism contract (the same one operators/similarity._pq_kmeans
keeps): training consumes (doc_id, text) rows in doc_id order, all
arithmetic is float64 numpy with fixed iteration count and reduction
order, and the shipped weights are rounded to 9dp — so the Spark
path (sample collected via TakeOrdered) and the DuckDB-oracle path
(sample read via pyarrow) produce bit-identical models that can be
literal-inlined into oracle SQL.

Tokenization uses the explicit six-char whitespace class contract
(see operators/dedup._WS_CHARS — engine trim()/\\s definitions
disagree across engines, the fuzz-pinned invariant), and the bucket
hash is the md5-hex32 the SQL oracles replay digit-by-digit.
"""

from __future__ import annotations

import hashlib

from env_event_stream_spark.operators.dedup import _WS_CHARS, _WS_RUN

__all__ = [
    "tokenize_py",
    "gopher_label",
    "bucket_of",
    "surface_features",
    "train_quality_classifier",
    "train_quality_classifier_py",
    "quality_logit_column",
]

N_BUCKETS = 256
# hashed buckets + 4 dense surface slots (inverse length, mean word
# length / 10, alphabetic ratio, stopword presence) — the quality
# signal is mostly SURFACE shape (the Gopher thresholds), which
# normalized term frequencies cannot see (tf is length-invariant);
# without these slots the fit degenerates to the majority class.
N_FEATURES = N_BUCKETS + 4


def tokenize_py(text: str | None) -> list[str]:
    """Python twin of functions.text.tokens (strip + split on the
    explicit whitespace class; empty text yields the single empty
    token, matching split(trim('')) in both engines)."""
    t = ("" if text is None else str(text)).strip(_WS_CHARS)
    return _WS_RUN.split(t) if t else [""]


def bucket_of(term: str, n_buckets: int = N_BUCKETS) -> int:
    """Hashing-trick feature index: uint32 from the first 8 hex chars
    of md5, mod n_buckets — replayed by _hex32_sql on the SQL side
    and _hex32_to_long on the Spark side."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


_STOPWORDS = ("the", "a", "of", "and")


def gopher_label(text: str | None) -> bool:
    """Python twin of the doc_gopher_quality_rules conjunction
    (llm_queries.doc_gopher_quality_rules): token-count 10..100000,
    mean word length 2..12, alphabetic-char ratio >= 0.55, at least
    one stopword. Label source for training only — the label logic
    never needs a SQL twin because BOTH engines receive the trained
    weights, not the labels."""
    t = "" if text is None else str(text)
    tk = tokenize_py(t)
    n = len(tk)
    if not (10 <= n <= 100000):
        return False
    mwl = sum(len(w) for w in tk) / n
    if not (2 <= mwl <= 12):
        return False
    n_alpha = sum(1 for ch in t if ("a" <= ch <= "z") or ("A" <= ch <= "Z"))
    if len(t) == 0 or n_alpha / len(t) < 0.55:
        return False
    return any(w in _STOPWORDS for w in tk)


def surface_features(text: str | None) -> tuple[float, float, float, float]:
    """The 4 dense slots: (1/n_tokens, mean_word_len/10,
    alpha_ratio, stopword_presence). Each is a ratio of exact
    integer counts (one float division) so the engine-side scoring
    twins (Catalyst expressions / DuckDB SQL) reproduce the values
    bit-exactly."""
    t = "" if text is None else str(text)
    tk = tokenize_py(t)
    n = len(tk)
    inv = 1.0 / n
    mwl10 = (sum(len(w) for w in tk) / n) / 10.0
    n_alpha = sum(1 for ch in t if ("a" <= ch <= "z") or ("A" <= ch <= "Z"))
    ar = (n_alpha * 1.0 / len(t)) if len(t) else 0.0
    stw = 1.0 if any(w in _STOPWORDS for w in tk) else 0.0
    return inv, mwl10, ar, stw


def quality_logit_column(text, weights: list[float], bias: float):
    """The trained model as ONE pure Catalyst column expression over
    a text column: z = (token-order fold of weight lookups)/n +
    dense-slot terms + bias. The weight vector rides as a 256-literal
    array (element_at per token); NO shuffle, NO join, NO
    transcendentals — scoring a 100 TB corpus is a scan-project, and
    the same expression drops into the stateless streaming ingest
    gate unchanged. The DuckDB oracle replays the identical
    token-order fold (list_transform + 1-based list index), so the
    raw double is bit-identical cross-engine."""
    from pyspark.sql import functions as F

    from env_event_stream_spark.functions.text import tokens
    from env_event_stream_spark.operators.dedup import _hex32_to_long

    n_b = N_BUCKETS
    from env_event_stream_spark.operators.similarity import _lit_arr

    warr = _lit_arr(weights[:n_b])  # one parsed literal (r16)
    tk = tokens(text)
    n = F.size(tk)
    sw = F.aggregate(
        F.transform(
            tk,
            lambda t: F.element_at(
                warr, ((_hex32_to_long(F.md5(t)) % n_b) + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    f_inv = F.lit(1.0) / n
    f_mwl = (
        F.aggregate(
            F.transform(tk, lambda x: F.length(x)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("double")
        / n
    ) / 10.0
    f_ar = F.coalesce(
        F.length(F.regexp_replace(text, "[^A-Za-z]", "")) * 1.0
        / F.nullif(F.length(text), F.lit(0)),
        F.lit(0.0),
    )
    f_stw = (
        F.when(
            F.size(F.filter(tk, lambda x: x.isin(*_STOPWORDS))) > 0, 1.0
        ).otherwise(0.0)
    )
    wi, wm, wa, ws = (float(weights[n_b + i]) for i in range(4))
    return (
        sw / n
        + F.lit(wi) * f_inv
        + F.lit(wm) * f_mwl
        + F.lit(wa) * f_ar
        + F.lit(ws) * f_stw
        + F.lit(float(bias))
    )


def train_quality_classifier(
    sample: list[tuple[int, str]],
    *,
    n_buckets: int = N_BUCKETS,
    n_iter: int = 200,
    lr: float = 1.0,
) -> tuple[list[float], float]:
    """Full-batch gradient-descent logistic regression on normalized
    hashed-term-frequency features plus the 4 dense surface slots.
    ``sample`` is (doc_id, text) pairs; rows are sorted by doc_id
    internally so caller order can't perturb the float reduction.
    Returns (weights[n_buckets + 4], bias), rounded to 9dp. Pure
    numpy float64, zero-init, fixed iterations — rerunning on the
    same sample is bit-identical.

    Determinism contract (r15, the k-means discipline from
    operators/kmeans_oracle): (w, b) are QUANTIZED to 9dp with Python
    round() after EVERY iteration, not just at ship. Each iteration
    therefore restarts from a state both this trainer and the
    INDEPENDENT pure-Python twin (train_quality_classifier_py —
    math.exp + left-to-right folds, no numpy) reproduce exactly, so
    accumulation-order divergence (BLAS matvec, SIMD np.exp, pairwise
    sums) cannot COMPOUND across the 200 iterations — it is absorbed
    by the rounding each step, and the two trainers agree bit-for-bit
    (tests/test_classifier.py parity pins). Before r15 the weights
    carried raw float64 across iterations, which made an independent
    oracle-side trainer impossible to parity-pin."""
    import numpy as np

    rows = sorted(sample, key=lambda r: int(r[0]))
    n_docs = len(rows)
    if n_docs == 0:
        raise ValueError("empty training sample")
    n_feat = n_buckets + 4
    X = np.zeros((n_docs, n_feat), dtype=np.float64)
    y = np.zeros(n_docs, dtype=np.float64)
    for i, (doc_id, text) in enumerate(rows):
        tk = tokenize_py(text)
        for w in tk:
            X[i, bucket_of(w, n_buckets)] += 1.0
        X[i, :n_buckets] /= len(tk)
        X[i, n_buckets:] = surface_features(text)
        y[i] = 1.0 if gopher_label(text) else 0.0
    w = np.zeros(n_feat, dtype=np.float64)
    b = 0.0
    for _ in range(n_iter):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g) / n_docs
        b -= lr * float(g.sum()) / n_docs
        # per-iteration 9dp quantization — Python round(), NOT
        # np.round (different half-way semantics), so the pure twin's
        # rounding is the same function
        w = np.array([round(float(x), 9) for x in w], dtype=np.float64)
        b = round(float(b), 9)
    return [float(x) for x in w], float(b)


def train_quality_classifier_py(
    sample: list[tuple[int, str]],
    *,
    n_buckets: int = N_BUCKETS,
    n_iter: int = 200,
    lr: float = 1.0,
) -> tuple[list[float], float]:
    """INDEPENDENT pure-Python twin of train_quality_classifier (the
    operators/kmeans_oracle precedent): stdlib math.exp, explicit
    left-to-right folds, no numpy. The DuckDB-oracle model cache
    (llm_queries._qc_model_cached) trains HERE, so the five
    classifier-family catalog hashes are backed by two independently
    written trainers. Bit-for-bit agreement is achievable because
    both trainers quantize (w, b) to 9dp after every iteration — the
    per-step state is identical on both sides and per-step
    accumulation-order divergence (~1e-15) sits far inside the 1e-9
    grid. Feature extraction reuses tokenize_py / bucket_of /
    surface_features / gopher_label — those are the shared FEATURE
    CONTRACT (replayed digit-by-digit by the SQL oracles), not
    trainer code."""
    import math

    rows = sorted(sample, key=lambda r: int(r[0]))
    n_docs = len(rows)
    if n_docs == 0:
        raise ValueError("empty training sample")
    n_feat = n_buckets + 4
    X: list[list[float]] = []
    y: list[float] = []
    for doc_id, text in rows:
        feat = [0.0] * n_feat
        tk = tokenize_py(text)
        for t in tk:
            feat[bucket_of(t, n_buckets)] += 1.0
        n_tk = len(tk)
        if n_tk:
            for j in range(n_buckets):
                feat[j] = feat[j] / n_tk
        else:  # numpy's 0.0/0 → nan, mirrored
            for j in range(n_buckets):
                feat[j] = float("nan")
        feat[n_buckets:] = [float(s) for s in surface_features(text)]
        X.append(feat)
        y.append(1.0 if gopher_label(text) else 0.0)
    w = [0.0] * n_feat
    b = 0.0
    for _ in range(n_iter):
        g = []
        for i in range(n_docs):
            z = 0.0
            xi = X[i]
            for j in range(n_feat):
                z += xi[j] * w[j]
            z += b
            p = 1.0 / (1.0 + math.exp(-z))
            g.append(p - y[i])
        # op order mirrors the numpy side exactly: (lr · acc) / n_docs
        for j in range(n_feat):
            acc = 0.0
            for i in range(n_docs):
                acc += X[i][j] * g[i]
            w[j] = round(w[j] - lr * acc / n_docs, 9)
        gs = 0.0
        for gi in g:
            gs += gi
        b = round(b - lr * gs / n_docs, 9)
    return [float(x) for x in w], float(b)
