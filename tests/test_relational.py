

def test_stratified_topn_exact_counts_and_partition_invariance(spark):
    """Exactly min(n, |stratum|) rows per stratum; the selected set is
    identical under a different partitioning (the df.sample failure
    mode this operator exists to avoid)."""
    from golem_spark.operators.relational import stratified_topn_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = stratified_topn_sample(docs, "doc_id", ["lang"], n=4)
    got = [(r["lang"], r["doc_id"], r["__rk"]) for r in out.collect()]
    sizes = docs.groupBy("lang").count().collect()
    expect_n = {r["lang"]: min(4, r["count"]) for r in sizes}
    per = {}
    for lang, _, _ in got:
        per[lang] = per.get(lang, 0) + 1
    assert per == expect_n
    reparted = stratified_topn_sample(docs.repartition(7, "source"),
                                      "doc_id", ["lang"], n=4)
    assert sorted(got) == sorted((r["lang"], r["doc_id"], r["__rk"])
                                 for r in reparted.collect())


def test_stratified_topn_plan_has_group_limit(spark):
    """rank<=n must plan as WindowGroupLimit so map tasks pre-trim to n
    before the stratum shuffle."""
    from golem_spark.operators.relational import stratified_topn_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (stratified_topn_sample(docs, "doc_id", ["lang", "source"], n=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "WindowGroupLimit" in plan
