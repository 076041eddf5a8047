"""Pin the xxhash64 gram-key contract (VERDICT r14 item 8).

The engine shuffles/joins word n-grams as 64-bit xxhash64 keys in
p26_contamination, p36_dup_ngram_fraction and p89_benchmark_containment
(guide §2.3 — fixed-width keys instead of ~6n-char strings). Equality-
by-hash merges distinct grams with birthday probability ~G^2/2^65,
invisible at every gated SF but a real approximation at 10^12-gram
scale. The safety property this test pins: the DuckDB ORACLE for those
queries must remain STRING-keyed — it must never adopt the engine's
hash keys — so that a hash collision that becomes visible at any gated
scale factor FAILS the correctness gate rather than passing silently
on both sides.
"""

import re

import __spark_entry__ as entrymod

HASHED_GRAM_QUERIES = ("p26_contamination", "p36_dup_ngram_fraction",
                       "p89_benchmark_containment")


def test_oracle_sql_stays_string_keyed():
    oracles = entrymod.oracle_sql()
    for name in HASHED_GRAM_QUERIES:
        sql = oracles[name]
        # no hash function anywhere in the oracle's gram pipeline
        assert not re.search(r"(?i)xxhash|hash\s*\(", sql), (
            f"{name}: oracle SQL must stay string-keyed so engine-side "
            "xxhash64 collisions fail the gate instead of matching")
        # and the gram construction is the textual n-gram join
        assert re.search(r"(?i)array_to_string|string_agg|\|\||concat",
                         sql), (
            f"{name}: expected string n-gram construction in the oracle")


def test_engine_uses_hashed_gram_keys():
    """The inverse pin: the engine side intentionally hashes gram keys
    (the optimization this contract documents). If that ever changes,
    update the collision-bound docstrings in pipeline/dedup.py and this
    test together."""
    import inspect

    from golem_spark.pipeline import dedup

    for fn in (dedup.contamination_check, dedup.dup_ngram_fraction,
               dedup.benchmark_containment):
        assert "xxhash64" in inspect.getsource(fn), fn.__name__
