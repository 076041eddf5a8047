"""MLlib interop: VectorUDT feature columns <-> plain numeric columns.

The engine works on plain columns (prunable, codegen-friendly), but
MLlib pipelines often carry a ``features: VectorUDT`` column
(VectorAssembler output, both DenseVector and SparseVector rows).
``vector_to_columns`` expands it losslessly; sparse rows expand to their
dense values (the reference's sparse path is a storage concern —
semantics are identical, and its center-on-sparse guard becomes moot
because Spark columns are stored columnar/compressed anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def vector_to_columns(df: DataFrame, vector_col: str = "features",
                      prefix: str = "f", drop: bool = True) -> tuple[DataFrame, list[str]]:
    """Expand a VectorUDT column into ``prefix{i}`` double columns.
    Returns (df, new_column_names)."""
    from pyspark.ml.functions import vector_to_array

    first = df.select(vector_col).first()
    if first is None:
        raise ValueError("empty DataFrame")
    dim = len(first[0])
    arr = vector_to_array(F.col(vector_col))
    out = df.withColumn("__varr", arr)
    names = [f"{prefix}{i}" for i in range(dim)]
    for i, nm in enumerate(names):
        out = out.withColumn(nm, F.col("__varr")[i].cast("double"))
    out = out.drop("__varr")
    if drop:
        out = out.drop(vector_col)
    return out, names


def columns_to_vector(df: DataFrame, cols: list[str],
                      vector_col: str = "features") -> DataFrame:
    """Assemble plain columns into a VectorUDT column (VectorAssembler)."""
    from pyspark.ml.feature import VectorAssembler

    return VectorAssembler(inputCols=list(cols), outputCol=vector_col).transform(df)


def vector_to_sparse_arrays(df: DataFrame, vector_col: str = "features",
                            idx_col: str = "idx", val_col: str = "val",
                            drop: bool = True) -> tuple[DataFrame, int]:
    """Expand a VectorUDT column into (indices, values) array columns
    WITHOUT densifying — SparseVector rows keep exactly their stored
    nonzeros (dense rows expand to all positions). The output feeds
    ``owl(df=..., sparse_features=(idx_col, val_col), sparse_p=dim)``.

    Returns (df, dim). Uses unwrap_udt (Spark >= 3.4): the UDT struct is
    (type: 0=sparse/1=dense, size, indices, values)."""
    from pyspark.sql.functions import unwrap_udt

    first = df.select(vector_col).first()
    if first is None:
        raise ValueError("empty DataFrame")
    dim = len(first[0])

    s = unwrap_udt(F.col(vector_col))
    is_sparse = s.getField("type") == 0
    vals = s.getField("values")
    idx = F.when(is_sparse, s.getField("indices")).otherwise(
        F.sequence(F.lit(0), F.size(vals) - 1).cast("array<int>"))
    out = df.withColumn(idx_col, idx).withColumn(val_col, vals)
    if drop:
        out = out.drop(vector_col)
    return out, dim
