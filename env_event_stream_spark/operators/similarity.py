"""Similarity search over embedding columns (SURVEY.md §2.11).

Two paths:
- ``knn_exact``  — brute-force cosine top-k: query-set × corpus join,
  windowed rank. Correctness baseline; cost O(|Q|·|C|) — fine for
  small query sets, never for corpus×corpus.
- ``knn_lsh``    — random-hyperplane LSH: 8-bit signatures via
  deterministic md5-derived hyperplanes, bucket equi-join on the
  signature, exact cosine rerank inside buckets. The 100 TB path:
  the corpus shuffles once on the signature; no cross product.

Embeddings are cast to double before any arithmetic so the
sequential-fold dot product (functions/vectors.py) is bit-compatible
with the DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import math as _math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from env_event_stream_spark.functions.vectors import as_double, cosine, dot, l2_norm

__all__ = [
    "hyperplanes",
    "knn_exact",
    "knn_pandas",
    "lsh_signature",
    "knn_lsh",
    "knn_lsh_multiprobe",
    "knn_ivf",
    "train_ivf_centroids",
    "train_pq_codebooks",
    "train_opq",
    "rotate_arrow",
    "pq_codes",
    "pq_recon_error",
    "knn_ivf_pq",
    "knn_ivf_pq_rerank",
    "semantic_dedup",
    "build_ivfpq_index",
    "search_ivfpq_index",
    "append_to_ivfpq_index",
    "binary_signature",
    "knn_binary",
    "cosine_dedup_pairs",
]


def _bt(name: str) -> str:
    """Backtick-quote a column NAME for SQL-string interpolation,
    escaping embedded backticks (`` ` `` doubles to ```` `` ````, the
    Spark SQL identifier rule) — so an adversarial column name cannot
    break the parse or resolve to a different expression (ADVICE r16).
    """
    return "`" + name.replace("`", "``") + "`"


def hyperplanes(
    n_planes: int = 8, dim: int = 64, *, salt: str = ""
) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is
    derived from md5(f"{salt}{p}:{d}") mapped to [-1, 1). Reproducible
    in any engine/language — the oracle embeds the same constants.
    ``salt`` yields independent plane sets for multi-probe LSH."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int(
                hashlib.md5(f"{salt}{p}:{d}".encode()).hexdigest()[:8], 16
            )
            row.append(round(h / 2**31 - 1.0, 9))
        planes.append(row)
    return planes


def knn_exact(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k per query. Output:
    (query_id, neighbor_id, rank, sim). Self-matches excluded.
    The corpus side is broadcast when small; for a large corpus use
    knn_lsh.

    k == 1 takes a map-side-combinable groupBy(min(struct)) fast
    path instead of the row_number window. Measured honestly: Spark
    3.5+'s WindowGroupLimit ALREADY pushes a partial top-k below the
    exchange for the rank<=k filter shape (so the window never
    shuffled the full scored expansion on this engine either); the
    aggregate is still ~1.8x faster at sf0.1 because the final side
    is one merge instead of Sort + Window recompute, and the
    reduction is explicit rather than dependent on an optimizer
    rewrite firing. Same result, same tie-break (sim desc,
    neighbor_id asc; all-null-sim groups keep the window's
    nulls-last/neighbor-asc semantics via the is-null struct flag).
    k > 1 keeps the window — WindowGroupLimit gives it the same
    partial reduction (plan-pinned in tests/test_plans.py)."""
    # norms are bound per vector BEFORE the join — computing them
    # inside the pair expression would redo two O(dim) folds per pair.
    # (one-parse expression text per r16 construction-cost discipline;
    # resolved expressions identical to as_double/l2_norm/dot)
    _vd = f"transform({_bt(vec_col)}, x -> CAST(x AS DOUBLE))"
    q = queries.select(
        F.col(id_col).alias("query_id"), F.expr(_vd).alias("qv")
    ).withColumn("qn", F.expr(f"sqrt({_dot_sql('qv', 'qv')})"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.expr(_vd).alias("cv")
    ).withColumn("cn", F.expr(f"sqrt({_dot_sql('cv', 'cv')})"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        # try_divide: a zero-norm vector's cosine is NULL instead of
        # an ANSI DIVIDE_BY_ZERO throw; NULL sorts LAST under `sim
        # desc` and last in the k=1 struct's is-null flag, so both
        # paths agree that a degenerate vector is nobody's neighbor
        # (the _nearest_cells try_divide precedent).
        .withColumn(
            "sim",
            F.expr(f"try_divide({_dot_sql('qv', 'cv')}, qn * cn)"),
        )
    )
    if k == 1:
        # min over an orderable struct: (sim IS NULL) asc puts real
        # sims first, -sim asc = sim desc, neighbor_id asc breaks
        # ties — exactly the window's ordering, as one partial-
        # aggregable Min (no post-shuffle sort or window recompute).
        # The NOT-isnan flag keeps degenerate-input parity with the
        # window AND the SQL oracles: both engines sort NaN (a
        # zero-norm vector's 0/0 cosine) as the LARGEST double, so
        # under `sim desc` a NaN row ranks first — negation alone
        # would flip that (NaN also sorts largest ascending).
        best = scored.groupBy("query_id").agg(
            F.min(
                F.struct(
                    F.col("sim").isNull().alias("sim_is_null"),
                    (~F.isnan("sim")).alias("sim_not_nan"),
                    (-F.col("sim")).alias("neg_sim"),
                    F.col("neighbor_id").alias("neighbor_id"),
                )
            ).alias("best")
        )
        return best.select(
            "query_id",
            F.col("best.neighbor_id").alias("neighbor_id"),
            F.lit(1).cast("bigint").alias("rank"),
            F.round(-F.col("best.neg_sim"), 6).alias("sim"),
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def lsh_signature(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Append an LSH bucket signature column: one bit per hyperplane
    (sign of the dot product), concatenated to a string key."""
    planes = planes or hyperplanes()
    plane_sqls = [_lit_arr_sql(row) for row in planes]
    if all(ps is not None for ps in plane_sqls):
        # the whole signature as ONE parsed expression (r16, the
        # _lit_arr round-trip contract): per plane, CASE over the
        # identical sequential-fold dot — resolved expression equal
        # to the Column-built form, ~10 py4j round trips per plane
        # saved at construction time
        v_sql = f"transform({_bt(vec_col)}, x -> CAST(x AS DOUBLE))"
        bits_sql = ",".join(
            f"CASE WHEN {_dot_sql(v_sql, ps)} >= 0 THEN '1' ELSE '0' END"
            for ps in plane_sqls
        )
        return df.withColumn("lsh_sig", F.expr(f"concat({bits_sql})"))
    v = as_double(F.col(vec_col))
    bits = []
    for row in planes:
        plane = _lit_arr(row)  # one parsed literal per plane (r16)
        bits.append(F.when(dot(v, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.withColumn("lsh_sig", F.concat(*bits))


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Bucketed ANN: equi-join on the hyperplane signature, exact
    cosine rerank within the bucket. Recall < 1 by construction (a
    near neighbor in a different bucket is missed) — that's the
    documented ANN trade; multi-probe = repeat with rotated plane
    sets and union."""
    planes = planes or hyperplanes()
    q = lsh_signature(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ).withColumnRenamed("qv", vec_col),
        vec_col=vec_col,
        planes=planes,
    ).select(
        "query_id",
        F.expr(f"transform({_bt(vec_col)}, x -> CAST(x AS DOUBLE))").alias("qv"),
        "lsh_sig",
    ).withColumn("qn", F.expr(f"sqrt({_dot_sql('qv', 'qv')})"))
    c = lsh_signature(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col)
        ),
        vec_col=vec_col,
        planes=planes,
    ).select(
        "neighbor_id",
        F.expr(f"transform({_bt(vec_col)}, x -> CAST(x AS DOUBLE))").alias("cv"),
        "lsh_sig",
    ).withColumn("cn", F.expr(f"sqrt({_dot_sql('cv', 'cv')})"))
    scored = (
        q.join(c, "lsh_sig")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim", F.expr(f"{_dot_sql('qv', 'cv')} / (qn * cn)")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def probe_signatures(n_planes: int, n_flips: int) -> list[list[int]]:
    """All bit-position subsets of size <= n_flips (1-based positions)
    — the probe sequence of multi-probe LSH. Shared by the Spark
    operator and the DuckDB oracle generator."""
    from itertools import combinations

    out: list[list[int]] = []
    for r in range(n_flips + 1):
        out.extend(list(c) for c in combinations(range(1, n_planes + 1), r))
    return out


def _flip_bits_sql(sig: str, positions: list[int], n_planes: int) -> str:
    """Flip the given 1-based character positions of a '0'/'1'
    signature string — pure literal-position substring/CASE/concat
    ops, emitted as SQL text so the whole probe set is one parse
    instead of ~40 py4j round trips per probe signature (r16
    construction-cost discipline; positions are literal ints, so no
    non-SQL-safe fallback is ever needed)."""
    if not positions:
        return sig
    parts: list[str] = []
    prev = 1
    for p in positions:
        if p > prev:
            parts.append(f"substring({sig}, {prev}, {p - prev})")
        parts.append(
            f"CASE WHEN substring({sig}, {p}, 1) = '1' "
            "THEN '0' ELSE '1' END"
        )
        prev = p + 1
    if prev <= n_planes:
        parts.append(f"substring({sig}, {prev}, {n_planes - prev + 1})")
    return "concat(" + ",".join(parts) + ")"


def knn_lsh_multiprobe(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_flips: int = 2,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al., VLDB'07 shape): the QUERY side
    probes every bucket within Hamming distance ``n_flips`` of its
    own signature (all <=n_flips bit-flip variants, generated with
    literal-position string ops), then candidates are deduped and
    exactly reranked. Near neighbors that straddle a few hyperplanes
    — the single-set LSH misses — are recovered without touching the
    corpus side: the corpus keeps ONE signature row per vector and
    the probe explosion multiplies only the (contractually small)
    query set by sum(C(n_planes, 0..n_flips)) (= 37 probes at 8
    planes / 2 flips). Still no cross product anywhere."""
    planes = hyperplanes(n_planes, dim)
    q = lsh_signature(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)),
        vec_col=vec_col,
        planes=planes,
    ).select(
        "query_id",
        F.expr(f"transform({_bt(vec_col)}, x -> CAST(x AS DOUBLE))").alias("qv"),
        "lsh_sig",
    ).withColumn("qn", F.expr(f"sqrt({_dot_sql('qv', 'qv')})"))
    flips_sql = ",".join(
        _flip_bits_sql("lsh_sig", pos, n_planes)
        for pos in probe_signatures(n_planes, n_flips)
    )
    probes = q.select(
        "query_id",
        "qv",
        "qn",
        F.explode(
            F.expr(f"array_distinct(array({flips_sql}))")
        ).alias("lsh_sig"),
    )
    c = lsh_signature(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)),
        vec_col=vec_col,
        planes=planes,
    ).select(
        "neighbor_id",
        F.expr(f"transform({_bt(vec_col)}, x -> CAST(x AS DOUBLE))").alias("cv"),
        "lsh_sig",
    ).withColumn("cn", F.expr(f"sqrt({_dot_sql('cv', 'cv')})"))
    scored = (
        probes.join(c, "lsh_sig")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim", F.expr(f"{_dot_sql('qv', 'cv')} / (qn * cn)")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def knn_pandas(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k with the Python-vectorized engine:
    the query matrix is collected once (query sets are small by
    contract), broadcast into a mapInPandas over corpus partitions,
    and each Arrow batch is scored with one numpy matmul —
    ~dim×batch×|Q| FLOPs per batch, no per-row Python. Each partition
    emits only its local top-k per query; the global top-k window
    then runs over |partitions|·|Q|·k rows, not the corpus.

    This is the rerank-path alternative to the pure-Catalyst
    knn_exact: same result, better constant factor at high dim /
    large batch (BLAS), at the cost of leaving codegen."""
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    qm = np.array([list(r[vec_col]) for r in q_rows], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cn = np.linalg.norm(cm, axis=1)
            sims = (qm @ cm.T) / (qn[:, None] * cn[None, :])  # |Q| × batch
            cids = pdf[id_col].to_numpy()
            out = {"query_id": [], "neighbor_id": [], "sim": []}
            for qi in range(len(q_ids)):
                s = sims[qi]
                mask = cids != q_ids[qi]
                idx = np.nonzero(mask)[0]
                if not len(idx):
                    continue
                # lexsort: sim desc, neighbor_id asc — the SAME
                # tie-break as the global window, so a boundary tie
                # can't cut the globally-ranked candidate locally
                top = idx[np.lexsort((cids[idx], -s[idx]))[:k]]
                out["query_id"].extend([q_ids[qi]] * len(top))
                out["neighbor_id"].extend(cids[top])
                out["sim"].extend(s[top])
            yield pd.DataFrame(out)

    local = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="query_id bigint, neighbor_id bigint, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def _nearest_cells(
    df: DataFrame,
    centroids: DataFrame,
    *,
    id_out: str,
    id_col: str,
    vec_col: str,
    n_probe: int,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroid cells
    (cosine argmax, centroid-id tie-break). The centroid table is tiny
    and broadcast; the 'cross join' is really |df| × n_cells broadcast
    lookups — no shuffle of df itself."""
    # one-parse expression text (r16 construction-cost discipline):
    # identical resolved expressions to the as_double/l2_norm/dot
    # Column builders, ~30 fewer py4j round trips per call
    v = df.select(
        F.col(id_col).alias(id_out),
        F.expr(f"transform({_bt(vec_col)}, x -> CAST(x AS DOUBLE))").alias("v"),
    ).withColumn("nrm", F.expr(f"sqrt({_dot_sql('v', 'v')})"))
    # try_divide: a zero-norm vector (or centroid) yields NULL, which
    # csim DESC sorts last — the same position the Arrow twin's -inf
    # takes. Under ANSI mode a plain `/` would THROW on the degenerate
    # input instead, silently diverging from the twin.
    scored = v.crossJoin(F.broadcast(centroids)).withColumn(
        "csim",
        F.expr(f"try_divide({_dot_sql('v', 'cv')}, nrm * cn)"),
    )
    w = Window.partitionBy(id_out).orderBy(
        F.col("csim").desc(), F.col("cell_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_probe)
        .select(id_out, "v", "nrm", "cell_id")
    )


def nearest_cells_arrow(
    df: DataFrame,
    centroids: DataFrame,
    *,
    id_out: str,
    id_col: str,
    vec_col: str,
    n_probe: int,
) -> DataFrame:
    """Arrow/numpy twin of _nearest_cells for the CORPUS side: the
    centroid table is a tiny driver-side model (n_cells rows — the
    one materialization this operator makes), captured in the closure
    and probed row-locally in a single MapInPandas stage. Two wins
    over the declarative form at scale: the cosine folds run
    vectorized in C instead of per-row interpreted lambdas, and the
    row_number window's Exchange on the vector id disappears — the
    corpus is never shuffled to be cell-assigned. Bit-identical to
    _nearest_cells (sequential-in-j dots, sqrt, first-max/lowest-cell
    tie-break via stable sort over ascending cell_id), pinned by
    tests. Output: (id_out, v, nrm, cell_id), n_probe rows per input
    row, same as _nearest_cells."""
    import numpy as np
    import pandas as pd

    cent = sorted(
        (int(r.cell_id), [float(x) for x in r.cv], float(r.cn))
        for r in centroids.select("cell_id", "cv", "cn").collect()
    )
    cell_ids = np.array([c[0] for c in cent], dtype=np.int64)
    C = np.array([c[1] for c in cent], dtype=np.float64)  # (ncells, dim)
    CN = np.array([c[2] for c in cent], dtype=np.float64)
    dim = C.shape[1]

    id_field = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_out} {id_field}, v array<double>, nrm double, cell_id bigint"
    )

    # _nearest_cells (rn <= n_probe) degrades gracefully to n_cells
    # rows per id when asked for more probes than cells; truncating
    # argsort columns while np.repeat'ing n_probe copies would build
    # mismatched-length columns instead — clamp to match the twin.
    n_probe = min(n_probe, len(cent))

    def assign(iter_):
        for pdf in iter_:
            n = len(pdf)
            if n == 0:
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            ss = np.zeros(n, dtype=np.float64)
            for j in range(dim):
                ss = ss + V[:, j] * V[:, j]
            nrm = np.sqrt(ss)
            csim = np.empty((n, len(cent)), dtype=np.float64)
            for c in range(len(cent)):
                acc = np.zeros(n, dtype=np.float64)
                for j in range(dim):
                    acc = acc + V[:, j] * C[c, j]
                den = nrm * CN[c]
                # Spark's Divide yields NULL on a zero divisor and
                # csim DESC sorts NULLS LAST; numpy would yield
                # inf/nan with a different sort position — map the
                # zero-divisor case to -inf (sorts last, cell_id
                # tie-break preserved by the stable argsort below)
                with np.errstate(divide="ignore", invalid="ignore"):
                    csim[:, c] = np.where(den == 0.0, -np.inf, acc / den)
            # stable argsort of -csim: ties keep ascending-cell order,
            # matching the window's (csim DESC, cell_id ASC)
            top = np.argsort(-csim, axis=1, kind="stable")[:, :n_probe]
            ids = np.repeat(pdf[id_col].to_numpy(), n_probe)
            yield pd.DataFrame(
                {
                    id_out: ids,
                    "v": [list(v) for v in np.repeat(V, n_probe, axis=0)],
                    "nrm": np.repeat(nrm, n_probe),
                    "cell_id": cell_ids[top].ravel(),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(assign, out_schema)


def collect_sample_matrix(corpus, *, id_col: str, vec_col: str, cap: int):
    """The ``cap`` lowest-id vectors as a float64 matrix in id order —
    THE training-sample determinism contract, shared by every trainer
    here (IVF spherical k-means, PQ codebooks) and mirrored exactly by
    the oracle-side pyarrow loader (ann_queries._oracle_sample_matrix):
    same rows, same order, same float32→float64 exact widening."""
    import numpy as np

    rows = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(cap)
        .select(as_double(F.col(vec_col)).alias("v"))
        .collect()
    )
    return np.array([list(r.v) for r in rows], dtype=np.float64)


def _cosine_assign(U, C):
    """Cosine argmax assignment whose scores REPLAY the pure twin's
    sequential fold op for op: per centroid, accumulate
    ``acc = acc + U[:, j] * C[c, j]`` dimension by dimension (the
    residual_assign accumulation), never a BLAS gemv/gemm. History of
    why, in two steps: (1) a single gemm ``U @ C.T`` routes different
    output columns through different kernel paths, so two
    BIT-IDENTICAL duplicate centroids could score 1 ulp apart and
    argmax picked the later one where the twin's strict first-max fold
    (kmeans_oracle.spherical_kmeans_py) keeps the earlier — the first
    r16 fix switched to one gemv per centroid; (2) gemv still sums in
    a vendor-chosen association, so two DIFFERENT centroids whose
    dots tie in one order but differ by 1 ulp in the other could
    still flip the argmax (caught by the r16 session-4 fuzz run:
    scores -0x1.6ce6932b985e7p-4 gemv vs ...e8p-4 sequential made a
    tie in one engine only). Per-dim accumulation makes every score
    bit-identical to ``kmeans_oracle._dot`` — ties and near-ties
    resolve identically by construction. Cost is irrelevant at
    trainer scale (sample_cap ≤ 4096 × n_cells ≤ 64 × dim ≤ 64)."""
    import numpy as np

    if not (np.isfinite(U).all() and np.isfinite(C).all()):
        raise ValueError(
            "_cosine_assign: non-finite component in vectors or "
            "centroids — a NaN score ranks as argmax here but keeps "
            "index 0 in the pure twin's strict fold, so the parity "
            "contract only covers finite inputs (kmeans_oracle guards "
            "its side identically)"
        )
    S = np.empty((U.shape[0], C.shape[0]), dtype=np.float64)
    for c in range(C.shape[0]):
        acc = np.zeros(U.shape[0], dtype=np.float64)
        for j in range(U.shape[1]):
            acc = acc + U[:, j] * C[c, j]
        S[:, c] = acc
    return np.argmax(S, axis=1)


def _spherical_step(U, C, _unit) -> list[list[float]]:
    """One spherical k-means update from unit vectors U given
    centroids C: cosine argmax assignment (first max = lowest cell id,
    matching the probe-side window tie-break), per-cell vector sums,
    renormalized means; empty cells keep their previous centroid."""
    import numpy as np

    a = _cosine_assign(U, C)
    sums = np.zeros(C.shape, dtype=np.float64)
    np.add.at(sums, a, U)
    return [
        _unit(sums[c]) if sums[c].any() else [float(x) for x in C[c]]
        for c in range(len(C))
    ]


def train_ivf_centroids(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    n_iter: int = 5,
    sample_cap: int | None = 4096,
) -> list[tuple[int, list[float]]]:
    """Deterministic spherical k-means coarse quantizer for IVF.

    Seed = the ``n_cells`` lowest-id corpus vectors (reproducible —
    no RNG); each iteration assigns vectors to their nearest centroid
    by cosine and replaces each centroid with the renormalized mean
    of its assigned UNIT vectors (spherical k-means; empty cells keep
    their previous centroid). Components are rounded to 9dp each
    iteration and the loop stops early once the rounded model is a
    fixpoint, so re-runs are bit-identical.

    Training-set shape (the faiss convention): a coarse quantizer
    needs ~tens of points per cell, not the corpus — by default the
    ``sample_cap`` lowest-id vectors (one bounded TakeOrdered; the
    MODEL and sample are O(cap × dim) on the driver regardless of
    corpus size) are trained in-process with numpy, and the 100 TB
    corpus is only ever touched by the distributed ASSIGNMENT join in
    knn_ivf. ``sample_cap=None`` trains on the full corpus instead:
    per iteration, one Arrow-batched mapInPandas pass computes each
    partition's per-cell vector sums with a numpy matmul +
    scatter-add, and only n_partitions × n_cells partial rows reach
    the driver, reduced in partition-id order so the float summation
    order — hence the model — stays deterministic. The corpus is
    never collected and never shuffled on either path.
    """
    import numpy as np
    import pandas as pd

    def _unit(vec) -> list[float]:
        n = float(sum(float(x) * float(x) for x in vec)) ** 0.5 or 1.0
        return [round(float(x) / n, 9) for x in vec]

    if sample_cap is not None:
        X = collect_sample_matrix(
            corpus, id_col=id_col, vec_col=vec_col, cap=sample_cap
        )
        U = np.array([_unit(x) for x in X], dtype=np.float64)
        cur = [list(u) for u in U[:n_cells]]
        for _ in range(n_iter):
            nxt = _spherical_step(U, np.array(cur, dtype=np.float64), _unit)
            if nxt == cur:
                break
            cur = nxt
        return list(enumerate(cur))

    seed_rows = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(as_double(F.col(vec_col)).alias("v"))
        .collect()
    )
    cents = [(c, _unit(list(r.v))) for c, r in enumerate(seed_rows)]
    unit = corpus.select(
        as_double(F.col(vec_col)).alias("v")
    ).withColumn(
        "u", F.transform(F.col("v"), lambda x: x / l2_norm(F.col("v")))
    ).select("u").cache()
    try:
        for _ in range(n_iter):
            C = np.array([vec for _, vec in cents], dtype=np.float64)

            def partials(batches, C=C):
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
                sums = np.zeros(C.shape, dtype=np.float64)
                seen = False
                for pdf in batches:
                    if not len(pdf):
                        continue
                    U = np.array(pdf["u"].tolist(), dtype=np.float64)
                    a = _cosine_assign(U, C)
                    np.add.at(sums, a, U)
                    seen = True
                if seen:
                    yield pd.DataFrame(
                        {
                            "pid": np.full(len(C), pid, dtype=np.int64),
                            "cell_id": np.arange(len(C), dtype=np.int64),
                            "s": list(sums),
                        }
                    )

            parts = unit.mapInPandas(
                partials, schema="pid bigint, cell_id bigint, s array<double>"
            ).collect()
            sums = np.zeros(C.shape, dtype=np.float64)
            for r in sorted(parts, key=lambda r: (r.cell_id, r.pid)):
                sums[r.cell_id] += np.asarray(r.s, dtype=np.float64)
            nxt = [
                (cid, _unit(sums[cid]) if sums[cid].any() else old)
                for cid, old in cents
            ]
            if nxt == cents:  # converged — rounded model is a fixpoint
                break
            cents = nxt
    finally:
        unit.unpersist()
    return cents


def _centroid_frame(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_cells: int,
    centroids: list[tuple[int, list[float]]] | None,
) -> DataFrame:
    """IVF coarse-quantizer cells as (cell_id, cv, cn): a trained
    model from train_ivf_centroids when given, else the deterministic
    first-n_cells-corpus-vectors stand-in (oracle-replayable, same
    plan). Shared by knn_ivf and knn_ivf_pq."""
    if centroids is not None:
        from env_event_stream_spark.tables import small_model_frame

        # one-Arrow-batch model frame: the list path parallelized 8
        # rows into 32 pickled partitions, so every centroid collect
        # or broadcast build downstream paid 32 no-op Python tasks
        # (~0.5 s of pure fixed cost per materialization, r16)
        return (
            small_model_frame(
                corpus.sparkSession, centroids, "cell_id int, cv array<double>"
            )
            .withColumn("cell_id", F.col("cell_id").cast("bigint"))
            .withColumn("cn", l2_norm(F.col("cv")))
        )
    return (
        corpus.where(F.col(id_col) < n_cells)
        .select(
            F.col(id_col).alias("cell_id"),
            as_double(F.col(vec_col)).alias("cv"),
        )
        .withColumn("cn", l2_norm(F.col("cv")))
    )


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_cells: int = 8,
    n_probe: int = 2,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF-flat ANN: a coarse quantizer partitions the corpus into
    ``n_cells`` inverted lists. ``centroids`` takes a trained model
    from ``train_ivf_centroids`` (the recall path); without it the
    centroids are the first ``n_cells`` corpus vectors — a
    deterministic, oracle-replayable stand-in with the SAME plan.
    Each query probes its ``n_probe`` nearest cells and reranks
    exactly inside them: candidates shrink ~n_probe/n_cells, and the
    only shuffle is the equi-join on cell_id. At 100 TB: n_cells ≈
    sqrt(N), inverted lists pre-bucketed by cell_id so the probe
    join is co-located."""
    cent = _centroid_frame(
        corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells,
        centroids=centroids,
    )
    inv = nearest_cells_arrow(
        corpus, cent, id_out="neighbor_id", id_col=id_col, vec_col=vec_col,
        n_probe=1,
    ).select("neighbor_id", F.col("v").alias("ce"), F.col("nrm").alias("cenrm"),
             "cell_id")
    probes = _nearest_cells(
        queries, cent, id_out="query_id", id_col=id_col, vec_col=vec_col,
        n_probe=n_probe,
    ).select("query_id", F.col("v").alias("qe"), F.col("nrm").alias("qnrm"),
             "cell_id")
    scored = (
        probes.join(inv, "cell_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            dot(F.col("qe"), F.col("ce")) / (F.col("qnrm") * F.col("cenrm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def _bsig_spark_sql(vec_sql: str, bits: int = 64) -> str:
    """SQL text of ``binary_signature`` over a vector SQL expression —
    the same unrolled CaseWhen/shiftleft sum, one parse (the _dot_sql
    pattern)."""
    terms = " + ".join(
        f"(CASE WHEN element_at({vec_sql}, {d + 1}) > 0 "
        f"THEN shiftleft(CAST(1 AS BIGINT), {d}) "
        "ELSE CAST(0 AS BIGINT) END)"
        for d in range(bits)
    )
    return f"CAST(0 AS BIGINT) + {terms}"


def binary_signature(vec, *, bits: int = 64):
    """Pack the sign bits of the first ``bits`` vector components
    into ONE bigint (bit d set iff component d > 0) — binary
    quantization, 64x smaller than float64 vectors. shiftleft is an
    unchecked bit op, so bit 63 lands in the sign bit without ANSI
    overflow; comparisons only ever use XOR/bit_count, which are
    sign-agnostic.

    ``vec`` may be a SQL expression STRING (preferred — the whole
    64-term sum parses as ONE F.expr; the Column-builder form cost
    ~0.7-1.3 s of py4j round trips PER CALL, measured r16, which was
    most of emb_binary_recall_eval's wall) or a Column (compat path,
    same expression tree built per-term). The parsed CASE WHEN chain
    resolves to exactly the Column form's CaseWhen/shiftleft tree —
    value-identical, probe-pinned on random vectors."""
    if bits > 64:
        raise ValueError("binary_signature packs at most 64 bits")
    if isinstance(vec, str):
        return F.expr(_bsig_spark_sql(vec, bits))
    sig = F.lit(0).cast("bigint")
    for d in range(bits):
        sig = sig + F.when(
            F.element_at(vec, d + 1) > 0,
            F.shiftleft(F.lit(1).cast("bigint"), d),
        ).otherwise(F.lit(0).cast("bigint"))
    return sig


def knn_binary(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    shortlist: int = 32,
    bits: int = 64,
) -> DataFrame:
    """Binary-quantized KNN with exact rescoring (the vector-DB
    BQ+rescore pattern): Hamming distance between packed sign bits
    shortlists ``shortlist`` candidates per query, then exact cosine
    reranks the shortlist to top-``k``.

    Scale shape: the Hamming scan IS a query×corpus pass, but each
    pair costs one XOR + popcount on a single int64 instead of a
    ``dim``-element float dot — the corpus is streamed once past the
    broadcast query signatures at ~1/64 the bytes and a fraction of
    the FLOPs, and only |Q|×shortlist rows ever reach the float
    rerank. The right tool when queries are few and IVF/LSH recall
    is not acceptable."""
    # whole projections as single selectExpr parses (r16 construction-
    # cost discipline — resolved trees identical to the Column form:
    # transform/CAST = as_double, sqrt(aggregate(...)) = l2_norm)
    _vd = f"transform({_bt(vec_col)}, x -> CAST(x AS DOUBLE))"
    q = queries.selectExpr(
        f"{_bt(id_col)} AS query_id", f"{_vd} AS qv"
    ).selectExpr(
        "query_id",
        "qv",
        f"{_bsig_spark_sql('qv', bits)} AS qsig",
        f"sqrt({_dot_sql('qv', 'qv')}) AS qn",
    )
    c = corpus.selectExpr(
        f"{_bt(id_col)} AS neighbor_id", f"{_vd} AS cv"
    ).selectExpr(
        "neighbor_id",
        "cv",
        f"{_bsig_spark_sql('cv', bits)} AS csig",
        f"sqrt({_dot_sql('cv', 'cv')}) AS cn",
    )
    hammed = (
        c.crossJoin(F.broadcast(q.select("query_id", "qsig")))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("csig").bitwiseXOR(F.col("qsig"))),
        )
    )
    wl = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    short = (
        hammed.withColumn("hrn", F.row_number().over(wl))
        .where(F.col("hrn") <= shortlist)
        .select("query_id", "neighbor_id", "cv", "cn")
    )
    scored = short.join(
        F.broadcast(q.select("query_id", "qv", "qn")), "query_id"
    ).withColumn("sim", F.expr(f"{_dot_sql('qv', 'cv')} / (qn * cn)"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )


def cosine_dedup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucketed candidate
    generation + exact cosine >= threshold verification. Only bucket
    collisions are scored — corpus never cross-joins itself."""
    planes = planes or hyperplanes()
    s = lsh_signature(df.select(id_col, vec_col), vec_col=vec_col, planes=planes)
    s = s.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v"), "lsh_sig"
    ).withColumn("nrm", l2_norm(F.col("v")))
    x, y = s.alias("x"), s.alias("y")
    return (
        x.join(y, "lsh_sig")
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .withColumn(
            "sim",
            dot(F.col("x.v"), F.col("y.v")) / (F.col("x.nrm") * F.col("y.nrm")),
        )
        .where(F.col("sim") >= threshold)
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.round("sim", 6).alias("sim"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ) — the canonical 100 TB vector-index
# compression: vectors become m small codes, query scoring becomes m
# table lookups (ADC), and IVF cells bound the candidate set.
# ---------------------------------------------------------------------------


def _pq_kmeans(X, m: int, k: int, n_iter: int) -> list[list[list[float]]]:
    """Deterministic per-subspace L2 k-means (the PQ codebook
    trainer) — the Spark-path core. Since r15 the DuckDB-oracle path
    retrains with an INDEPENDENTLY written pure-Python twin
    (operators/kmeans_oracle.pq_kmeans_py); both produce bit-identical
    codebooks, pinned by tests/test_kmeans_oracle_independence.py.
    Seeds are the first ``k`` subvectors in input order; centroid
    components round to 9dp per iteration with a rounded-fixpoint
    early stop; empty cells keep their previous centroid. No RNG
    anywhere."""
    import numpy as np

    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(
            f"PQ requires dim divisible by m: dim={dim}, m={m} "
            f"(trailing {dim % m} dims would be silently dropped)"
        )
    d = dim // m
    books: list[list[list[float]]] = []
    for i in range(m):
        S = X[:, i * d : (i + 1) * d]
        cur = [[round(float(x), 9) for x in S[j]] for j in range(k)]
        for _ in range(n_iter):
            C = np.array(cur, dtype=np.float64)
            # distances and sums REPLAY the pure twin's op order
            # (kmeans_oracle.pq_kmeans_py) exactly — the
            # _cosine_assign lesson applied to L2: numpy's
            # ``(...**2).sum(axis=2)`` uses pairwise/unrolled
            # association for reduction lengths >= 8 (the catalog's
            # d = 64/8 = 8 exactly), so a near-tie could argmin
            # differently than the twin's sequential ``t += df*df``;
            # per-dim accumulation makes every distance
            # bit-identical. np.add.at is unbuffered and processes
            # rows in INDEX ORDER — the twin's row-by-row sums.
            d2 = np.empty((S.shape[0], k), dtype=np.float64)
            for c in range(k):
                acc = np.zeros(S.shape[0], dtype=np.float64)
                for j in range(d):
                    df = S[:, j] - C[c, j]
                    acc = acc + df * df
                d2[:, c] = acc
            a = np.argmin(d2, axis=1)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, a, S)
            counts = np.bincount(a, minlength=k)
            nxt = []
            for c in range(k):
                if counts[c]:
                    nxt.append(
                        [
                            round(float(x) / int(counts[c]), 9)
                            for x in sums[c]
                        ]
                    )
                else:
                    nxt.append([float(x) for x in cur[c]])
            if nxt == cur:
                break
            cur = nxt
        books.append(cur)
    return books


def train_pq_codebooks(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    n_iter: int = 10,
    sample_cap: int = 4096,
) -> list[list[list[float]]]:
    """PQ codebooks from the ``sample_cap`` lowest-id vectors (one
    bounded TakeOrdered — a codebook needs a sample, never the
    corpus; the model is m × k × dim/m floats on the driver
    regardless of corpus size)."""
    X = collect_sample_matrix(
        corpus, id_col=id_col, vec_col=vec_col, cap=sample_cap
    )
    return _pq_kmeans(X, m, k, n_iter)


def _dot_sql(a: str, b: str) -> str:
    """SQL text of functions/vectors.dot — the identical sequential
    fold (zip_with product, double-accumulator aggregate), emitted as
    text so a whole scoring expression can be ONE F.expr parse instead
    of ~10 py4j round trips per dot (r16: DataFrame CONSTRUCTION, not
    execution, dominated the warm ANN walls — 2,146 round trips ≈
    1.2 s for one ADC query)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "0.0D, (acc, x) -> acc + x)"
    )


def _lit_arr_sql(vals: list[float]) -> str | None:
    """SQL text of a literal array<double>, or None when any value is
    non-finite (repr('nan') is not SQL — callers fall back to the
    per-element Column path)."""
    vs = [float(x) for x in vals]
    if all(_math.isfinite(x) for x in vs):
        return "array(" + ",".join(f"{x!r}D" for x in vs) + ")"
    return None


def _lit_arr(vals: list[float]):
    """Literal array<double> as ONE parsed SQL expression. The
    F.array(*[F.lit(x) ...]) form costs one py4j round trip per
    element — a m=8 x k=16 x d=8 codebook built ~1,500 Column calls
    per query, which dominated the ANN family's DataFrame
    CONSTRUCTION time (measured r16: 2-6 s/query of pure driver
    Python, zero executor work). repr() doubles round-trip exactly
    through the SQL parser (both sides are correctly-rounded
    shortest-decimal binary64), so the literal tree is bit-identical
    — pinned by tests; non-finite values fall back to the old
    per-element path (repr('nan') is not SQL)."""
    vs = [float(x) for x in vals]
    if all(_math.isfinite(x) for x in vs):
        return F.expr("array(" + ",".join(f"{x!r}D" for x in vs) + ")")
    return F.array(*[F.lit(x) for x in vs])


def _cc(vals: list[float]) -> float:
    """Left-to-right sum of squares — bit-identical to the sequential
    fold / list_dot_product both engines use on the same literals."""
    acc = 0.0
    for x in vals:
        acc = acc + float(x) * float(x)
    return acc


def _lit_book_sql(book: list[list[float]]) -> str | None:
    """SQL text of a literal array<array<double>> codebook, or None
    when any value is non-finite (the _lit_arr_sql contract)."""
    rows = [_lit_arr_sql(c) for c in book]
    if all(r is not None for r in rows):
        return "array(" + ",".join(rows) + ")"
    return None


def _lit_book(book: list[list[float]]):
    """One subspace codebook as a literal array<array<double>> — a
    single Catalyst literal node, so the per-subspace objective is ONE
    zip_with/aggregate template instead of k separate fold trees
    (which made analysis/codegen time explode at k=16, m=8). Built as
    one parsed expression (the _lit_arr round-trip contract)."""
    if all(_math.isfinite(float(x)) for c in book for x in c):
        rows = ",".join(
            "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"
            for c in book
        )
        return F.expr(f"array({rows})")
    return F.array(*[_lit_arr(c) for c in book])


def _pq_objs(sub, book: list[list[float]]):
    """Array of k assignment objectives -2<s,c> + <c,c> for one
    subspace (the <s,s> term is constant per subspace and dropped).
    <c,c> is inlined as a Python-computed literal (_cc) so neither
    engine recomputes it with a different accumulation order; the
    <s,c> dot is the shared sequential fold."""
    return F.zip_with(
        _lit_book(book),
        _lit_arr([_cc(c) for c in book]),
        lambda c, cc: -2.0 * dot(sub, c) + cc,
    )


def pq_codes(vec, books: list[list[list[float]]]):
    """1-based PQ code per subspace as array<int>, pure codegen'd
    array expressions — row-local, zero shuffles at any scale.
    First-min tie-break = lowest code, matching the oracle's
    row_number(ORDER BY obj, code)."""
    d = len(books[0][0])
    codes = []
    for i, book in enumerate(books):
        sub = F.slice(vec, i * d + 1, d)
        objs = _pq_objs(sub, book)
        codes.append(F.array_position(objs, F.array_min(objs)).cast("int"))
    return F.array(*codes)


def pq_encode_arrow(
    df: DataFrame,
    books: list[list[list[float]]],
    *,
    vec_col: str,
    keep: list[str],
    with_recon: bool = False,
    residual_cells: dict | None = None,
) -> DataFrame:
    """Arrow/numpy twin of pq_codes (+ pq_recon_error): identical math
    in the identical accumulation order (sequential over the d dims,
    then over the m subspaces — bit-identical to the Catalyst folds,
    pinned by tests), but vectorized over rows in C via mapInPandas
    instead of per-row interpreted higher-order-function lambdas.
    Catalyst never whole-stage-codegens zip_with/aggregate lambdas, so
    at corpus scale the interpreted encode costs ~1 ms/row; the Arrow
    path is ~6x faster at sf0.1 and the gap widens with batch size.
    Row-local, zero shuffles at any scale — the plan is a single
    MapInPandas over the scan. ``keep`` columns pass through; the
    output drops ``vec_col`` and appends codes (+ recon_err)."""
    import numpy as np
    import pandas as pd

    m = len(books)
    k = len(books[0])
    d = len(books[0][0])
    B = np.array(books, dtype=np.float64)
    ccs = [[_cc(c) for c in book] for book in books]

    in_cols = [*keep, vec_col]
    fields = [df.schema[c] for c in keep]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in fields]
        + ["codes array<int>"]
        + (["recon_err double"] if with_recon else [])
    )

    def encode(iter_):
        for pdf in iter_:
            n = len(pdf)
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            ) if n else np.zeros((0, m * d))
            if residual_cells is not None and n:
                # residual IVF-PQ: encode v - centroid[cell]
                # (cell_id must be in the keep columns)
                C = np.array(
                    [residual_cells[int(c)] for c in pdf["cell_id"]]
                )
                V = V - C
            codes = np.empty((n, m), dtype=np.int32)
            recon = np.zeros(n, dtype=np.float64)
            for i in range(m):
                sub = V[:, i * d : (i + 1) * d]
                objs = np.empty((n, k), dtype=np.float64)
                for c in range(k):
                    # acc += sub[j]*c[j] sequentially in j — the exact
                    # fold order of the Catalyst/oracle dot
                    acc = np.zeros(n, dtype=np.float64)
                    for j in range(d):
                        acc = acc + sub[:, j] * B[i, c, j]
                    objs[:, c] = -2.0 * acc + ccs[i][c]
                codes[:, i] = np.argmin(objs, axis=1) + 1  # first-min
                if with_recon:
                    ss = np.zeros(n, dtype=np.float64)
                    for j in range(d):
                        ss = ss + sub[:, j] * sub[:, j]
                    recon = recon + (ss + np.min(objs, axis=1))
            out = {f.name: pdf[f.name] for f in fields}
            out["codes"] = list(codes)
            if with_recon:
                out["recon_err"] = recon
            yield pd.DataFrame(out)

    return df.select(*in_cols).mapInPandas(encode, out_schema)


def pq_recon_error(vec, books: list[list[list[float]]]):
    """Total squared reconstruction error of the PQ encoding,
    accumulated over subspaces in index order (sequential fold — the
    oracle sums the same per-subspace terms m-ordered)."""
    d = len(books[0][0])
    errs = []
    for i, book in enumerate(books):
        sub = F.slice(vec, i * d + 1, d)
        errs.append(dot(sub, sub) + F.array_min(_pq_objs(sub, book)))
    return F.aggregate(F.array(*errs), F.lit(0.0), lambda acc, x: acc + x)


def knn_ivf_pq(
    queries: DataFrame,
    corpus: DataFrame,
    books: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_cells: int = 8,
    n_probe: int = 2,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF-PQ ANN with asymmetric distance computation (ADC): the
    corpus is stored as m PQ codes (here 8 bytes/vector vs 256 for
    float32x64 — the compression that makes a 100 TB index fit);
    each query precomputes an m × k lookup table of subspace dot
    products, and scoring a candidate costs m array lookups instead
    of a dim-length dot product. Candidates come from the same
    deterministic IVF cell probe as knn_ivf (equi-join on cell_id —
    the only shuffle; no cross product); pass ``centroids`` from
    train_ivf_centroids for the trained-cell variant (the full faiss
    IVFPQ recipe), else the first-n_cells stand-in is used."""
    cent = _centroid_frame(
        corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells,
        centroids=centroids,
    )
    inv = pq_encode_arrow(
        nearest_cells_arrow(
            corpus, cent, id_out="neighbor_id", id_col=id_col,
            vec_col=vec_col, n_probe=1,
        ),
        books,
        vec_col="v",
        keep=["neighbor_id", "cell_id"],
    )
    probes = _nearest_cells(
        queries, cent, id_out="query_id", id_col=id_col, vec_col=vec_col,
        n_probe=n_probe,
    )
    return _adc_topk(probes, inv, books, k)


def _adc_topk(
    probes: DataFrame, inv, books, k: int, *, with_cell_dot: bool = False
) -> DataFrame:
    """The ADC scoring tail shared by knn_ivf_pq and
    search_ivfpq_index: per-query m × k LUT of subspace dots, cell_id
    equi-join against the (neighbor_id, cell_id, codes) inverted
    list, m array lookups per candidate, windowed top-k. One source
    for the value-critical scoring so the live and persisted-index
    paths cannot drift."""
    d = len(books[0][0])

    book_sqls = [_lit_book_sql(book) for book in books]
    if all(bs is not None for bs in book_sqls):
        # whole m-subspace LUT as ONE parsed expression (the _lit_arr
        # round-trip contract): per-subspace transform over the
        # literal codebook, the same sequential-fold dot — resolved
        # expression identical to the Column-built form, ~500 fewer
        # py4j round trips per query
        lut = F.expr(
            "array(" + ",".join(
                f"transform({bs}, c -> "
                + _dot_sql(f"slice(v, {i * d + 1}, {d})", "c")
                + ")"
                for i, bs in enumerate(book_sqls)
            ) + ")"
        )
    else:

        def _sub_dot(i: int):
            # NB: a default-arg lambda would grow a second parameter,
            # which PySpark reads as the (element, index) transform
            # form — close over i via a factory instead
            return lambda c: dot(F.slice(F.col("v"), i * d + 1, d), c)

        lut = F.array(
            *[
                F.transform(_lit_book(book), _sub_dot(i))
                for i, book in enumerate(books)
            ]
        )
    pcols = ["query_id", "cell_id"] + (["qc"] if with_cell_dot else [])
    probes = probes.select(*pcols, lut.alias("lut"))
    adc_sum = F.expr(
        "aggregate(zip_with(lut, codes, (l, c) -> element_at(l, c)), "
        "0.0D, (acc, x) -> acc + x)"
    )
    # residual ADC: <q, x> ~= <q, c_cell> + residual LUT sum (qc
    # added FIRST — the oracle spells the same `qc + list_sum` order)
    score = (F.col("qc") + adc_sum) if with_cell_dot else adc_sum
    scored = (
        probes.join(inv, "cell_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc_score", score)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("adc_score", 6).alias("adc_score"),
        )
    )


def knn_ivf_pq_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    books: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    r_cand: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Two-stage retrieval (the faiss ``refine`` / IndexRefineFlat
    recipe): the IVF-PQ/ADC pipeline proposes ``r_cand`` candidates
    per query from the COMPRESSED index — cheap, but ranked by
    quantized scores — then the candidate ids alone are joined back
    to the full-precision vectors for an exact cosine re-rank to
    top-``k``. This converts ADC's quantization error from a ranking
    error into only a candidate-miss risk, at the cost of fetching
    r_cand full vectors per query.

    Scale shape: stage 1 is knn_ivf_pq unchanged (cell_id equi-join
    is the only corpus shuffle). Stage 2's candidate list is
    |Q| x r_cand rows — broadcast back against the corpus, so the
    100 TB side is a streamed broadcast-hash probe that fetches only
    candidate vectors; no new corpus shuffle, no pair explosion.
    Output: (query_id, neighbor_id, rank, sim) — exact cosine, the
    same contract as knn_exact."""
    cand = knn_ivf_pq(
        queries,
        corpus,
        books,
        id_col=id_col,
        vec_col=vec_col,
        k=r_cand,
        n_cells=n_cells,
        n_probe=n_probe,
        centroids=centroids,
    ).select("query_id", "neighbor_id")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", l2_norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", l2_norm(F.col("qv")))
    scored = (
        c.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "sim", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim")
        )
    )


def semantic_dedup(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    n_cells: int = 8,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): semantic deduplication scoped
    to k-means clusters. Every vector is assigned to its nearest
    cell; WITHIN each cell, any pair with cosine > ``threshold`` is
    a semantic-duplicate pair, and the member kept is the one LESS
    similar to the centroid (the paper's max-diversity rule; id
    ascending breaks exact ties). Output: one row per vector —
    (id, cell_id, cent_sim, keep boolean) — the verdict column a
    corpus builder anti-joins on.

    Scale shape: cell assignment is the zero-shuffle Arrow probe
    (nearest_cells_arrow — centroid model broadcast in the closure);
    the pair generation is a self-equi-join on cell_id, so candidates
    are bounded by cell populations and the corpus never
    cross-joins itself (with real training, n_cells grows with the
    corpus to hold cells at ~constant size — the paper uses 50k
    clusters; the deterministic first-``n_cells`` stand-in here keeps
    the oracle literal-free). The dominated set is DISTINCT victim
    ids (tiny), joined back as the keep flag.

    Contrast cosine_dedup_pairs/emb_dup_clusters (LSH-bucketed exact
    near-dup PAIRS + transitive components): SemDeDup trades recall
    near cell borders for cluster-bounded candidates and a built-in,
    diversity-preserving keep rule."""
    cent = _centroid_frame(
        corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells,
        centroids=centroids,
    )
    a = nearest_cells_arrow(
        corpus, cent, id_out=id_col, id_col=id_col, vec_col=vec_col,
        n_probe=1,
    )
    a = (
        a.join(F.broadcast(cent), "cell_id")
        .withColumn(
            "cs", dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
        )
        .select(id_col, "cell_id", "v", "nrm", "cs")
    )
    x, y = a.alias("x"), a.alias("y")
    pair_sim = dot(F.col("x.v"), F.col("y.v")) / (
        F.col("x.nrm") * F.col("y.nrm")
    )
    dom = (
        x.join(y, "cell_id")
        .where(F.col(f"x.{id_col}") != F.col(f"y.{id_col}"))
        .where(pair_sim > threshold)
        .where(
            (F.col("x.cs") < F.col("y.cs"))
            | (
                (F.col("x.cs") == F.col("y.cs"))
                & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            )
        )
        .select(F.col(f"y.{id_col}").alias("_victim"))
        .distinct()
    )
    return (
        a.join(
            F.broadcast(dom), a[id_col] == dom["_victim"], "left"
        )
        .select(
            id_col,
            "cell_id",
            F.round("cs", 6).alias("cent_sim"),
            F.col("_victim").isNull().alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# OPQ — Optimized Product Quantization (rotated PQ)
# ---------------------------------------------------------------------------


def _opq_train(
    X, m: int, k: int, pq_iter: int = 10, opq_iter: int = 8
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Deterministic non-parametric OPQ trainer (Ge et al., CVPR'13):
    alternate (a) PQ codebooks on the rotated sample with (b) the
    orthogonal-Procrustes rotation R = U·Vᵀ from svd(Xᵀ·X̂) that best
    aligns the data with its own PQ reconstruction X̂. Shared verbatim
    by the Spark path (train_opq) and the DuckDB-oracle path
    (ann_queries rebuilds X with pyarrow), exactly like _pq_kmeans —
    both see the identical float64 sample, numpy/LAPACK is the same
    library on both, so R and the codebooks are bit-identical and can
    be inlined as oracle literals. R is rounded to 9dp and the final
    codebooks retrained against the ROUNDED rotation, so the shipped
    (R, books) pair is self-consistent. Training is driver-side on a
    bounded sample — the model is dim² + m·k·(dim/m) floats no matter
    the corpus size."""
    import numpy as np

    dim = X.shape[1]
    R = np.eye(dim)
    for _ in range(opq_iter):
        XR = X @ R
        books = _pq_kmeans(XR, m, k, pq_iter)
        B = np.array(books, dtype=np.float64)  # (m, k, d)
        d = dim // m
        parts = []
        for i in range(m):
            S = XR[:, i * d : (i + 1) * d]
            d2 = ((S[:, None, :] - B[i][None, :, :]) ** 2).sum(axis=2)
            parts.append(B[i][np.argmin(d2, axis=1)])
        Xhat = np.concatenate(parts, axis=1)
        U, _s, Vt = np.linalg.svd(X.T @ Xhat)
        R = U @ Vt
    Rr = np.round(R, 9)
    books = _pq_kmeans(X @ Rr, m, k, pq_iter)
    # Training rotates ROW vectors (XR = X @ R, i.e. y_o = Σⱼ xⱼ·R[j,o]);
    # rotate_arrow and the oracle apply y_o = Σⱼ M[o,j]·xⱼ — so ship
    # M = Rᵀ, making the applied rotation identical to the one the
    # codebooks were trained in. (Shipping R untransposed quantizes in
    # a basis the books never saw: recall collapses to PQ-level —
    # caught by the recall-delta eval.)
    return [[float(x) for x in row] for row in Rr.T], books


def train_opq(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    pq_iter: int = 10,
    opq_iter: int = 8,
    sample_cap: int = 4096,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """(rotation, codebooks) from the sample_cap lowest-id vectors —
    the same bounded TakeOrdered sample train_pq_codebooks uses."""
    X = collect_sample_matrix(
        corpus, id_col=id_col, vec_col=vec_col, cap=sample_cap
    )
    return _opq_train(X, m, k, pq_iter, opq_iter)


def _whiten_train(X, eps: float = 1e-6):
    """Deterministic PCA-whitening trainer: (mu, W) such that
    y = W·(x - mu) has identity covariance on the training sample
    (up to eps regularization). Eigendecomposition of the sample
    covariance via numpy's symmetric eigh, eigenvalues sorted
    DESCENDING with a stable argsort, rows of W = Vᵀ scaled by
    1/sqrt(eig + eps). Shared verbatim by the Spark path
    (train_whitening) and the DuckDB-oracle path (ann_queries
    rebuilds the sample with pyarrow) — identical float64 sample +
    the same LAPACK = bit-identical (mu, W), the _pq_kmeans/_opq_train
    contract. mu and W are rounded to 9dp so the shipped literals are
    self-consistent on both sides. The model is dim + dim² floats no
    matter the corpus size; training is driver-side on the bounded
    collect_sample_matrix sample."""
    import numpy as np

    n = X.shape[0]
    mu = X.mean(axis=0)
    Xc = X - mu
    C = (Xc.T @ Xc) / n
    evals, V = np.linalg.eigh(C)  # ascending eigenvalues
    order = np.argsort(-evals, kind="stable")
    evals, V = evals[order], V[:, order]
    W = (V / np.sqrt(evals + eps)).T  # row d = PC_d / sqrt(eig_d)
    return (
        [round(float(x), 9) for x in mu],
        [[round(float(x), 9) for x in row] for row in W],
    )


def train_whitening(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 4096,
    eps: float = 1e-6,
) -> tuple[list[float], list[list[float]]]:
    """(mu, W) from the sample_cap lowest-id vectors — the same
    bounded TakeOrdered sample every trainer here uses."""
    X = collect_sample_matrix(
        corpus, id_col=id_col, vec_col=vec_col, cap=sample_cap
    )
    return _whiten_train(X, eps)


def rotate_arrow(
    df: DataFrame, R: list[list[float]], *, vec_col: str, keep: list[str]
) -> DataFrame:
    """Row-local orthogonal rotation y = R·x of an embedding column
    (the OPQ pre-step), as a single MapInPandas stage — zero shuffles
    at any scale, same plan shape as pq_encode_arrow. Each output
    component is the SEQUENTIAL fold Σⱼ R[o,j]·x[j] in j order —
    bit-identical to the oracle's list_dot_product(e, rv) — so the
    rotated vectors downstream cell-assign/encode/score the same on
    both engines. Output keeps ``keep`` and replaces ``vec_col`` with
    the rotated array<double>."""
    import numpy as np
    import pandas as pd

    Rm = np.array(R, dtype=np.float64)
    n_out, dim = Rm.shape

    fields = [df.schema[c] for c in keep]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in fields]
        + [f"{vec_col} array<double>"]
    )

    def rot(iter_):
        for pdf in iter_:
            n = len(pdf)
            if n == 0:
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            Y = np.empty((n, n_out), dtype=np.float64)
            for o in range(n_out):
                acc = np.zeros(n, dtype=np.float64)
                for j in range(dim):
                    acc = acc + Rm[o, j] * V[:, j]
                Y[:, o] = acc
            out = {f.name: pdf[f.name] for f in fields}
            out[vec_col] = [list(y) for y in Y]
            yield pd.DataFrame(out)

    return df.select(*keep, vec_col).mapInPandas(rot, out_schema)


# ---------------------------------------------------------------------------
# IVF-PQ index lifecycle — build once, persist, search many
# ---------------------------------------------------------------------------


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    n_cells: int = 10,
    n_iter: int = 10,
    sample_cap: int = 4096,
    cents: list[tuple[int, list[float]]] | None = None,
    books: list[list[list[float]]] | None = None,
    rotation: list[list[float]] | None = None,
) -> None:
    """Materialize a searchable IVF-PQ index: train spherical-k-means
    cells + PQ codebooks (bounded driver-side sample), encode the
    corpus to (neighbor_id, codes), and write it PARTITIONED BY
    cell_id with the model as a JSON sidecar. The build is the same
    one-pass row-local encode knn_ivf_pq runs inline; the payoff is
    operational — train/encode ONCE, then every search reads only its
    probe cells (parquet partition pruning: n_probe/n_cells of the
    index, the inverted-list skip a native ANN library does with its
    own storage). 8 codes/vector ≈ 32× smaller than the float32
    corpus. Pass pre-trained ``cents``/``books`` to skip training
    (e.g. models already cached by a caller)."""
    import json
    import os

    if rotation is not None:
        # OPQ index: rotate the corpus (one extra row-local Arrow
        # stage) before cell-assign + encode. ``cents``/``books`` are
        # then models in ROTATED space (train them on the rotated
        # corpus or rotate driver-side); the rotation ships in the
        # sidecar so searches rotate queries to match.
        corpus = rotate_arrow(
            corpus, rotation, vec_col=vec_col, keep=[id_col]
        )
    if cents is None:
        cents = train_ivf_centroids(
            corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells,
            n_iter=n_iter, sample_cap=sample_cap,
        )
    if books is None:
        books = train_pq_codebooks(
            corpus, id_col=id_col, vec_col=vec_col, m=m, k=k, n_iter=n_iter,
            sample_cap=sample_cap,
        )
    cent = _centroid_frame(
        corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells,
        centroids=cents,
    )
    inv = pq_encode_arrow(
        nearest_cells_arrow(
            corpus, cent, id_out="neighbor_id", id_col=id_col,
            vec_col=vec_col, n_probe=1,
        ),
        books,
        vec_col="v",
        keep=["neighbor_id", "cell_id"],
    )
    inv.write.mode("overwrite").partitionBy("cell_id").parquet(
        os.path.join(path, "inv")
    )
    with open(os.path.join(path, "model.json"), "w") as f:
        # repr-exact floats: json round-trips float64 losslessly
        json.dump(
            {
                "centroids": cents,
                "books": books,
                "m": m,
                "k": k,
                "rotation": rotation,
            },
            f,
        )


def search_ivfpq_index(
    spark,
    path: str,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int = 2,
) -> DataFrame:
    """ADC top-k against a persisted IVF-PQ index. The probe cells are
    computed from the sidecar model and collected (|Q| × n_probe tiny
    rows), then pushed as a LITERAL isin filter on the partition
    column — the scan prunes to n_probe∕n_cells of the index files
    (static partition pruning; asserted by plan test). Scoring is the
    exact _adc_topk tail knn_ivf_pq uses, so live and persisted
    searches are value-identical."""
    import json
    import os

    with open(os.path.join(path, "model.json")) as f:
        model = json.load(f)
    cents = [(int(c), [float(x) for x in v]) for c, v in model["centroids"]]
    books = [[[float(x) for x in c] for c in book] for book in model["books"]]
    rot = model.get("rotation")
    if rot is not None:
        # OPQ index: queries must probe/score in the same rotated
        # space the corpus was encoded in
        queries = rotate_arrow(
            queries,
            [[float(x) for x in row] for row in rot],
            vec_col=vec_col,
            keep=[id_col],
        )

    cent = _centroid_frame(
        queries, id_col=id_col, vec_col=vec_col, n_cells=len(cents),
        centroids=cents,
    )
    # persist the probe assignment: it is both collected (for the
    # literal partition filter) and joined (for scoring) — without the
    # persist the assignment would compute twice, and a
    # nondeterministic `queries` input could even diverge between the
    # two evaluations
    probes = _nearest_cells(
        queries, cent, id_out="query_id", id_col=id_col, vec_col=vec_col,
        n_probe=n_probe,
    ).persist()
    probe_cells = sorted(
        {int(r.cell_id) for r in probes.select("cell_id").distinct().collect()}
    )
    inv = spark.read.parquet(os.path.join(path, "inv")).where(
        F.col("cell_id").isin(probe_cells)
    )
    inv = inv.select(
        "neighbor_id", F.col("cell_id").cast("bigint").alias("cell_id"), "codes"
    )
    return _adc_topk(probes, inv, books, k)


def append_to_ivfpq_index(
    new_vectors: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Grow a persisted IVF-PQ index WITHOUT retraining: encode the
    new vectors with the index's saved cells + codebooks and append
    them to the partitioned inverted list (dynamic partition append —
    only the touched cell partitions gain files). This is how a
    production ANN index absorbs a stream of new embeddings; quality
    degrades only as the data distribution drifts from the original
    training sample, at which point a rebuild retrains. Search needs
    no change — pruning and ADC scoring read the union."""
    import json
    import os

    with open(os.path.join(path, "model.json")) as f:
        model = json.load(f)
    cents = [(int(c), [float(x) for x in v]) for c, v in model["centroids"]]
    books = [[[float(x) for x in c] for c in book] for book in model["books"]]
    rot = model.get("rotation")
    if rot is not None:
        # OPQ index: queries must probe/score in the same rotated
        # space the corpus was encoded in
        queries = rotate_arrow(
            queries,
            [[float(x) for x in row] for row in rot],
            vec_col=vec_col,
            keep=[id_col],
        )

    cent = _centroid_frame(
        new_vectors, id_col=id_col, vec_col=vec_col, n_cells=len(cents),
        centroids=cents,
    )
    inv = pq_encode_arrow(
        nearest_cells_arrow(
            new_vectors, cent, id_out="neighbor_id", id_col=id_col,
            vec_col=vec_col, n_probe=1,
        ),
        books,
        vec_col="v",
        keep=["neighbor_id", "cell_id"],
    )
    inv.write.mode("append").partitionBy("cell_id").parquet(
        os.path.join(path, "inv")
    )


# ---------------------------------------------------------------------------
# Residual IVF-PQ (the true faiss IndexIVFPQ semantics): PQ encodes
# x - centroid(cell(x)) instead of x. Residuals are much smaller in
# magnitude than raw vectors, so the same 8-byte budget spends its
# codewords on the part of the vector the coarse quantizer couldn't
# explain — the standard recall win over raw-vector PQ at equal cost.
# ADC then scores <q, x> ~= <q, c_cell> + sum_m <q_m, cv_code_m>.
# ---------------------------------------------------------------------------


def residual_assign(X, centroids: list[tuple[int, list[float]]]):
    """Pure-numpy cosine cell assignment + residual matrix for a
    sample — the Spark-side residual codebook trainer's core. Since
    r15 the DuckDB-oracle path uses the INDEPENDENT pure-Python twin
    (operators/kmeans_oracle.residual_assign_py); the trained books
    agree bit-for-bit, parity-pinned. Assignment = first-max cosine
    with ascending-cell tie-break (the nearest_cells_arrow rule);
    residual = X - C[assigned]."""
    import numpy as np

    cent = sorted((int(cid), [float(x) for x in cv]) for cid, cv in centroids)
    C = np.array([c[1] for c in cent], dtype=np.float64)
    dim = C.shape[1]
    ss = np.zeros(len(X), dtype=np.float64)
    for j in range(dim):
        ss = ss + X[:, j] * X[:, j]
    nrm = np.sqrt(ss)
    cn = np.sqrt((C * C).sum(axis=1))
    csim = np.empty((len(X), len(cent)), dtype=np.float64)
    for c in range(len(cent)):
        acc = np.zeros(len(X), dtype=np.float64)
        for j in range(dim):
            acc = acc + X[:, j] * C[c, j]
        den = nrm * cn[c]
        with np.errstate(divide="ignore", invalid="ignore"):
            csim[:, c] = np.where(den == 0.0, -np.inf, acc / den)
    a = np.argsort(-csim, axis=1, kind="stable")[:, 0]
    return X - C[a]


def train_pq_codebooks_residual(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    n_iter: int = 10,
    sample_cap: int = 4096,
) -> list[list[list[float]]]:
    """Residual PQ codebooks: the bounded sample is cell-assigned
    against the trained centroids, and _pq_kmeans trains on the
    residuals. Model size and training cost identical to the
    raw-vector trainer."""
    X = collect_sample_matrix(
        corpus, id_col=id_col, vec_col=vec_col, cap=sample_cap
    )
    return _pq_kmeans(residual_assign(X, centroids), m, k, n_iter)


def knn_ivf_pq_residual(
    queries: DataFrame,
    corpus: DataFrame,
    books: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int = 2,
    centroids: list[tuple[int, list[float]]],
) -> DataFrame:
    """IVF-PQ ADC over RESIDUAL codes: corpus rows encode
    (v - centroid[cell]) row-locally (the Arrow encode gains one
    vectorized subtraction); queries carry <q, c_cell> per probed
    cell and the ADC score adds it to the residual LUT sum. Same
    plan shape as knn_ivf_pq — the residual twist adds zero
    shuffles."""
    import numpy as np

    cent = _centroid_frame(
        corpus, id_col=id_col, vec_col=vec_col, n_cells=len(centroids),
        centroids=centroids,
    )
    cmap = {int(cid): np.array(cv, dtype=np.float64) for cid, cv in centroids}
    inv = pq_encode_arrow(
        nearest_cells_arrow(
            corpus, cent, id_out="neighbor_id", id_col=id_col,
            vec_col=vec_col, n_probe=1,
        ),
        books,
        vec_col="v",
        keep=["neighbor_id", "cell_id"],
        residual_cells=cmap,
    )
    probes = _nearest_cells(
        queries, cent, id_out="query_id", id_col=id_col, vec_col=vec_col,
        n_probe=n_probe,
    ).join(
        F.broadcast(cent.select("cell_id", "cv")), "cell_id"
    ).withColumn("qc", dot(F.col("v"), F.col("cv")))
    return _adc_topk(probes, inv, books, k, with_cell_dot=True)
