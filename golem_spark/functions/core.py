"""Core column functions (JVM-side expressions, whole-stage codegen).

Each is the single definition of a primitive several operators share —
and each has a fixed cross-engine contract with DuckDB for the oracle
kernels (see pipeline/kernels.py for the DuckDB twins).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def softplus(z: Column) -> Column:
    """log(1 + exp(z)) without overflow: max(z,0) + log1p(exp(-|z|))."""
    return F.greatest(z, F.lit(0.0)) + F.log1p(F.exp(-F.abs(z)))


def sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def md5_int60(col: Column) -> Column:
    """Deterministic 60-bit integer from any string — bit-identical to
    DuckDB's ('0x'||substr(md5(x),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns (sequential double accumulation
    — deterministic order, matches DuckDB list_dot_product)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
