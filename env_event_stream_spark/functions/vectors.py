"""Vector math over array<float|double> columns — pure Catalyst
higher-order functions (zip_with product + sequential aggregate fold),
no UDF. The fold is left-to-right, matching a plain C loop, so double
results are bit-identical to DuckDB's list_dot_product on the same
data — which is what lets cosine similarities survive a value-hash
comparison.

At 100 TB these expressions run inside whole-stage codegen per row;
for very high dims or batch-heavy rerank paths a vectorized pandas
UDF (numpy matmul per Arrow batch) is the alternative — see
operators/similarity.py:knn_pandas for that variant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["as_double", "dot", "l2_norm", "cosine", "cosine_with_norms"]


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product: aggregate(zip_with(a,b,*), 0.0, +)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe for zero vectors (returns null)."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def cosine_with_norms(
    a: Column, b: Column, na: Column, nb: Column
) -> Column:
    """``cosine`` with the two L2 norms PRECOMPUTED as columns (r16,
    guide §2.3): per pair this folds the arrays once (the dot) instead
    of three times, and a vector joined against many partners pays its
    norm once instead of once per partner. BIT-IDENTICAL to
    ``cosine``: the norm columns must be built with ``l2_norm`` on the
    same array, so the division sees the same doubles in the same
    order — only the schedule changes, never a value (oracle-safe)."""
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))
