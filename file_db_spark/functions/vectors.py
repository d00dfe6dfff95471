"""Vector math over ArrayType(FloatType) embedding columns — native
Column expressions (zip_with / aggregate), JVM-side, no UDFs.

Used by the similarity-search and embedding-dedup operators. At 100 TB
scale the expressions run inside codegen; the expensive part is the
join strategy (see operators/similarity.py), not the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "l2_norm", "cosine", "unit_normalize"]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return (dot(a, b) / (l2_norm(a) * l2_norm(b))).cast("double")


def unit_normalize(a: Column) -> Column:
    """Pre-normalize embeddings once so cosine becomes a plain dot
    product in the join — halves the per-pair flops at scale."""
    n = l2_norm(a)
    return F.transform(a, lambda x: (x / n).cast("double"))
