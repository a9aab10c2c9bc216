"""Independent pure-Python k-means trainers for the DuckDB oracles.

The lazy oracles for the k-means-trained ANN families (IVF coarse
quantizer, PQ codebooks, residual-PQ codebooks) used to verify by
REPLAYING the numpy trainer cores from operators/similarity
(`_spherical_step`, `_pq_kmeans`, `residual_assign`) — honest, but a
logic bug in a shared core would replicate into its own oracle. This
module is a from-scratch reimplementation of the same training
CONTRACTS using only the Python stdlib (no numpy): explicit
left-to-right float folds, first-max / first-min tie-breaks, the same
9-decimal-place per-iteration rounding and rounded-fixpoint early
stop. ann_queries' oracle builders now train HERE, so every
IVF/PQ/residual-PQ catalog hash is backed by two independently
written trainers — the operators/bpe.py `learn_merges_py` /
operators/unigram_lm.py precedent.
tests/test_kmeans_oracle_independence.py pins bit-for-bit agreement
between both trainer pairs on the real testdata samples and on
hypothesis-fuzzed matrices (including integer-valued inputs that
force exact assignment ties, so the tie-break rules themselves are
compared).

Why bit-for-bit agreement is achievable (and where the tripwire is):
- the unit-normalize helper is a shared CONTRACT, not shared code:
  n = sqrt(left-to-right sum of squares) or 1.0, then round(x/n, 9) —
  both sides implement it in plain Python floats;
- per-cell accumulation adds rows in input order (np.add.at is
  sequential in index order), so given equal assignments the addition
  sequences are identical IEEE-754 op streams;
- the only places numpy's accumulation order differs (BLAS dots in
  the spherical assignment, pairwise-summed L2 distances and means in
  PQ) feed either an argmax/argmin — safe unless two DISTINCT
  centroids land within ~1 ulp of each other — or a round(·, 9),
  which absorbs the ulp unless a component sits within ~1e-13 of a
  grid midpoint. The parity pytest and the full-catalog oracle sweep
  are the loud tripwires if real data ever hits either window.
- exact-DUPLICATE centroids scoring exactly equal in both engines is
  NOT free: a blocked BLAS gemm (``U @ C.T``) can score two
  bit-identical centroid columns 1 ulp apart when they straddle a
  kernel block boundary (r16 fix, found by the fuzz suite's duplicate
  -seed examples). The numpy side therefore assigns via
  similarity._cosine_assign — one gemv per centroid, an identical op
  stream for identical centroids — so both tie-breaks provably pick
  the lowest index on duplicates.

Cost model: pure Python over the bounded driver-side sample only
(sample_cap ≤ 4096 rows × 64 dims — the model is O(cap·dim) no matter
the corpus size), built once per (sf_dir, params) behind the existing
lru_cache oracle builders. The 100 TB corpus never flows through this
module; it exists so the CORRECTNESS gate is independent, not as an
execution path.

Out of scope, deliberately: the OPQ rotation (`_opq_train`) and the
whitening transform (`_whiten_train`) stay shared-core — both hinge
on LAPACK factorizations (SVD / eigh) whose bit pattern no pure
Python reimplementation can reproduce, so an "independent" twin there
could never be parity-pinned. Their INNER k-means step is still
cross-checked transitively: `_pq_kmeans` itself is pinned against
`pq_kmeans_py` by the parity tests.
"""

from __future__ import annotations

__all__ = [
    "spherical_kmeans_py",
    "pq_kmeans_py",
    "residual_assign_py",
]


def _unit9(vec: list[float]) -> list[float]:
    """Unit-normalize + round each component to 9dp — the shared
    determinism contract of similarity.train_ivf_centroids' `_unit`
    (left-to-right sum of squares; zero vectors divide by 1.0)."""
    n = 0.0
    for x in vec:
        fx = float(x)
        n += fx * fx
    n = n**0.5 or 1.0
    return [round(float(x) / n, 9) for x in vec]


def _dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _require_finite(X, who: str) -> None:
    """Loud guard for the documented determinism contract: a NaN score
    would make the strict ``s > best`` fold keep index 0 forever while
    numpy's argmax/stable argsort rank NaN as the maximum — a silent
    parity trap. Unreachable with real embeddings (testdata vectors
    are finite by construction); asserted so non-finite input fails at
    the trainer entry instead of as a confusing oracle mismatch."""
    import math

    for i, row in enumerate(X):
        for x in row:
            if not math.isfinite(float(x)):
                raise ValueError(
                    f"{who}: non-finite component {x!r} in sample row "
                    f"{i} — the bit-for-bit parity contract only "
                    "covers finite inputs"
                )


def spherical_kmeans_py(
    X, n_cells: int, n_iter: int
) -> list[list[float]]:
    """Spherical k-means over sample rows ``X`` (any float sequence-
    of-sequences): seeds = the first ``n_cells`` unit rows, cosine
    first-max assignment with lowest-cell tie-break, per-cell unit-row
    sums in input order, renormalized 9dp-rounded means, empty cells
    (all-zero sums, mirroring numpy's ``sums[c].any()``) keep their
    previous centroid, rounded-fixpoint early stop. Returns the
    centroid list (cell_id = list index)."""
    _require_finite(X, "spherical_kmeans_py")
    U = [_unit9(list(row)) for row in X]
    cur = [list(u) for u in U[:n_cells]]
    if not cur:
        return cur
    dim = len(cur[0])
    for _ in range(n_iter):
        sums = [[0.0] * dim for _ in cur]
        for u in U:
            bi = 0
            best = _dot(u, cur[0])
            for c in range(1, len(cur)):
                s = _dot(u, cur[c])
                if s > best:  # strict: first max wins, like np.argmax
                    bi, best = c, s
            row = sums[bi]
            for j, x in enumerate(u):
                row[j] += x
        nxt = [
            _unit9(sums[c])
            if any(x != 0.0 for x in sums[c])
            else [float(x) for x in cur[c]]
            for c in range(len(cur))
        ]
        if nxt == cur:  # converged — rounded model is a fixpoint
            break
        cur = nxt
    return cur


def pq_kmeans_py(
    X, m: int, k: int, n_iter: int
) -> list[list[list[float]]]:
    """Per-subspace L2 k-means (the PQ codebook contract of
    similarity._pq_kmeans): split each row into ``m`` d-dim
    subvectors, seed each subspace with its first ``k`` subvectors
    rounded to 9dp, assign by squared-L2 first-min (lowest code on
    ties, like np.argmin), replace each code with the 9dp-rounded
    mean of its assigned subvectors (empty codes — no assignments —
    keep their previous value), rounded-fixpoint early stop."""
    _require_finite(X, "pq_kmeans_py")
    rows = [list(map(float, row)) for row in X]
    dim = len(rows[0]) if rows else 0
    if dim % m != 0:
        raise ValueError(
            f"PQ requires dim divisible by m: dim={dim}, m={m} "
            f"(trailing {dim % m} dims would be silently dropped)"
        )
    d = dim // m
    books: list[list[list[float]]] = []
    for i in range(m):
        lo = i * d
        S = [row[lo : lo + d] for row in rows]
        cur = [[round(x, 9) for x in S[j]] for j in range(k)]
        for _ in range(n_iter):
            counts = [0] * k
            sums = [[0.0] * d for _ in range(k)]
            for s in S:
                bi = 0
                best = None
                for c in range(k):
                    cc = cur[c]
                    t = 0.0
                    for j in range(d):
                        df = s[j] - cc[j]
                        t += df * df
                    if best is None or t < best:  # first min wins
                        bi, best = c, t
                counts[bi] += 1
                row = sums[bi]
                for j in range(d):
                    row[j] += s[j]
            nxt = []
            for c in range(k):
                if counts[c]:
                    n = counts[c]
                    nxt.append([round(x / n, 9) for x in sums[c]])
                else:
                    nxt.append([float(x) for x in cur[c]])
            if nxt == cur:
                break
            cur = nxt
        books.append(cur)
    return books


def residual_assign_py(
    X, centroids: list[tuple[int, list[float]]]
) -> list[list[float]]:
    """Cosine cell assignment + residual rows — the pure-Python twin
    of similarity.residual_assign's contract: first-max cosine with
    ascending-cell tie-break (zero-norm products score -inf), residual
    = x - centroid[assigned]. Given equal assignments the subtraction
    is exact, so the residual matrix matches bit-for-bit."""
    _require_finite(X, "residual_assign_py")
    _require_finite([cv for _, cv in centroids], "residual_assign_py[centroids]")
    cent = sorted(
        (int(cid), [float(x) for x in cv]) for cid, cv in centroids
    )
    C = [cv for _, cv in cent]
    cn = []
    for cv in C:
        acc = 0.0
        for x in cv:
            acc += x * x
        cn.append(acc**0.5)
    out: list[list[float]] = []
    neg_inf = float("-inf")
    for row in X:
        x = [float(v) for v in row]
        ss = 0.0
        for v in x:
            ss += v * v
        nrm = ss**0.5
        bi = 0
        best = None
        for c, cv in enumerate(C):
            den = nrm * cn[c]
            if den == 0.0:
                s = neg_inf
            else:
                s = _dot(x, cv) / den
            if best is None or s > best:  # first max wins
                bi, best = c, s
        cb = C[bi]
        out.append([x[j] - cb[j] for j in range(len(x))])
    return out
