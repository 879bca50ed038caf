"""Bloom membership prefilter (operators/dedup.py bloom_* family)."""

import pytest
from pyspark.sql import functions as F

from mariadb_to_graylog_spark.operators.dedup import (
    bloom_build,
    bloom_positions,
    bloom_probe,
)


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_no_false_negatives(spark):
    """Every key present in the build side MUST probe positive -- the
    bloom contract that makes the prefilter safe in front of dedup."""
    corpus = _docs(spark, [f"doc number {i} body" for i in range(50)])
    bloom = bloom_build(corpus, F.col("text"), m_bits=1 << 16, k=3)
    # batch = 10 exact copies + 10 fresh docs
    batch = _docs(
        spark,
        [f"doc number {i} body" for i in range(10)]
        + [f"fresh unseen {i}" for i in range(10)],
        start=1000,
    )
    got = {
        r.doc_id: r.bloom_positive
        for r in bloom_probe(batch, bloom, F.col("text"), 1 << 16, 3).collect()
    }
    assert all(got[1000 + i] for i in range(10)), "false negative!"


def test_false_positives_counted_not_admitted(spark):
    """At a deliberately saturated m (64 bits for 40 keys, fill ~85%)
    false positives MUST appear -- and each one is exactly a row whose
    3 positions are all set while its md5 is absent (recomputed brute
    force here)."""
    m, k = 64, 3
    corpus = _docs(spark, [f"corpus {i}" for i in range(40)])
    bloom = bloom_build(corpus, F.col("text"), m, k)
    set_bits = {r.pos for r in bloom.collect()}
    batch = _docs(spark, [f"candidate {i}" for i in range(60)], start=500)
    probed = bloom_probe(batch, bloom, F.col("text"), m, k).collect()
    import hashlib

    def positions(t):
        h = hashlib.md5(t.encode()).hexdigest()
        return [int(h[8 * i : 8 * i + 8], 16) % m for i in range(k)]

    expect = {
        500 + i: all(p in set_bits for p in positions(f"candidate {i}"))
        for i in range(60)
    }
    got = {r.doc_id: r.bloom_positive for r in probed}
    assert got == expect
    assert any(expect.values()), "test corpus failed to produce any FP"
    assert not all(expect.values())


def test_probe_plan_has_no_shuffle(spark):
    """The probe stage is k broadcast joins: the batch side must plan
    ZERO hash-partition exchanges (that absence IS the scale claim)."""
    corpus = _docs(spark, [f"c{i}" for i in range(20)])
    bloom = bloom_build(corpus, F.col("text"))
    probed = bloom_probe(
        _docs(spark, [f"b{i}" for i in range(20)]), bloom, F.col("text")
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("BroadcastHashJoin") == 3


def test_positions_portable_and_bounded(spark):
    row = (
        spark.range(1)
        .select(bloom_positions(F.lit("abc"), m_bits=1 << 20, k=4).alias("p"))
        .collect()[0]
    )
    import hashlib

    h = hashlib.md5(b"abc").hexdigest()
    assert row.p == [int(h[8 * i : 8 * i + 8], 16) % (1 << 20) for i in range(4)]
    with pytest.raises(ValueError):
        bloom_positions(F.lit("x"), k=5)
