"""sources/, functions/, plans/ layers."""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from golem_spark.functions import cosine, dot, md5_int60, sigmoid, softplus
from golem_spark.plans import FitControl, plan_properties
from golem_spark.sources import read_table, write_bucketed, write_partitioned


def test_functions_numerics(spark):
    df = spark.range(1).select(
        softplus(F.lit(800.0)).alias("sp_big"),
        softplus(F.lit(-800.0)).alias("sp_small"),
        sigmoid(F.lit(0.0)).alias("sig"),
        md5_int60(F.lit("abc")).alias("h"),
        dot(F.array(F.lit(1.0), F.lit(2.0)), F.array(F.lit(3.0), F.lit(4.0))).alias("d"),
        cosine(F.array(F.lit(1.0), F.lit(0.0)), F.array(F.lit(1.0), F.lit(0.0))).alias("c"),
    ).collect()[0]
    assert df["sp_big"] == 800.0          # no overflow
    assert df["sp_small"] == 0.0
    assert df["sig"] == 0.5
    assert df["h"] == 648541476951500027  # duckdb-verified constant
    assert df["d"] == 11.0
    assert abs(df["c"] - 1.0) < 1e-12


def test_read_write_roundtrip(spark, tmp_path):
    pdf = pd.DataFrame({"k": [1, 2, 1, 2], "v": [1.0, 2.0, 3.0, 4.0]})
    df = spark.createDataFrame(pdf)
    out = str(tmp_path / "part")
    write_partitioned(df, out, ["k"])
    back = read_table(spark, out)
    assert back.count() == 4
    # partition pruning: filtering on k reads only one directory
    plan = plan_properties(back.filter(F.col("k") == 1))
    assert plan["n_scans"] == 1


def test_lake_format_stub(spark, tmp_path):
    with pytest.raises(ImportError, match="delta"):
        read_table(spark, str(tmp_path), fmt="delta")


def test_bucketed_write_joins_without_shuffle(spark, tmp_path):
    pdf = pd.DataFrame({"k": np.arange(100) % 7, "v": np.arange(100, dtype=float)})
    df = spark.createDataFrame(pdf)
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")
    write_bucketed(df, "bt_a", "k", n_buckets=4, path=str(tmp_path / "a"))
    write_bucketed(df, "bt_b", "k", n_buckets=4, path=str(tmp_path / "b"))
    j = (spark.table("bt_a").groupBy("k").count()
         .join(spark.table("bt_b").groupBy("k").count(), "k"))
    props = plan_properties(j)
    # bucketed layout: aggregations and join reuse bucket partitioning —
    # no SHUFFLE exchange anywhere (a broadcast exchange is fine)
    assert props["bucketed_scan"]
    assert props["n_shuffle_exchanges"] == 0


def test_fit_control_roundtrip():
    from golem_spark.path import owl
    from golem_spark.data import random_problem

    ctl = FitControl(family="gaussian", n_sigma=6, q=0.2)
    ctl2 = FitControl.from_dict(ctl.to_dict())
    assert ctl2 == ctl
    x, y, _ = random_problem(n=80, p=4, seed=80)
    fit = owl(x, y, **ctl2.to_owl_kwargs())
    assert fit.n_sigma >= 1


def test_training_shards_roundtrip_deterministic(spark, tmp_path):
    """write_training_shards: one directory per non-empty shard, full
    content round-trip, shard membership identical under a different
    input partitioning, rows sorted within each shard file."""
    import os

    from pyspark.sql import functions as F

    from golem_spark.sources.io import (shard_assign, shard_manifest,
                                        write_training_shards)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, "doc_id", n_shards=8)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) \
        == sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    dirs = {d for d in os.listdir(out) if d.startswith("__shard=")}
    nonempty = {r["__shard"] for r in
                shard_assign(docs, "doc_id", 8).select("__shard").collect()}
    assert dirs == {f"__shard={s}" for s in nonempty}
    # membership survives repartition (content-hash rule)
    a = {(r["doc_id"], r["__shard"]) for r in
         shard_assign(docs, "doc_id", 8).collect()}
    b = {(r["doc_id"], r["__shard"]) for r in
         shard_assign(docs.repartition(5, "lang"), "doc_id", 8).collect()}
    assert a == b
    # within-shard sort: per input file, doc_id ascending — accumulate
    # over EVERY shard directory (a single trailing check would only
    # verify the last one)
    per_file = {}
    for d in sorted(dirs):
        rows = spark.read.parquet(os.path.join(out, d)) \
            .withColumn("__f", F.input_file_name()) \
            .select("__f", "doc_id").collect()
        for r in rows:
            per_file.setdefault(r["__f"], []).append(r["doc_id"])
    assert len(per_file) >= len(dirs)
    for ids in per_file.values():
        assert ids == sorted(ids)
    # manifest load shares sum to ~1e6 and count every row
    man = shard_manifest(docs, "doc_id", 8).collect()
    assert sum(r["n_rows"] for r in man) == docs.count()
    assert 1000000 - 8 <= sum(r["load_ppm"] for r in man) <= 1000000
