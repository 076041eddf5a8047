"""Reusable column functions shared by the engine's operators."""

from golem_spark.functions.core import (
    cosine,
    dot,
    l2_norm,
    md5_int60,
    sigmoid,
    softplus,
)

__all__ = ["cosine", "dot", "l2_norm", "md5_int60", "sigmoid", "softplus"]
