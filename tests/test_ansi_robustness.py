"""The engine must behave identically under Spark 4's default ANSI mode --
a library consumer brings their own session, and the parser's
well-formedness logic is built on null-on-invalid, never raise.

Found by end-to-end verification: a bare 3-token line crashed
``element_at`` under ANSI while every ansi-off test session passed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import make_conv
from reference_sim import simulate_error_log, simulate_slow_log
from mariadb_to_graylog_spark.operators.errorlog import parse_error_log_lines
from mariadb_to_graylog_spark.operators.slowlog import parse_slow_log
from mariadb_to_graylog_spark.operators.assembly import assemble_error_entries

EDGE_LINES = [
    "2019-11-01 16:10:48",  # 3 tokens: OOB element_at under ANSI
    "2019-13-01 16:10:48 0 [Note] month 13 -> malformed, not an error",
    "2019-11-01 :: 0 [Note] empty time parts",
    "99999999999999999999 12:00:00 [Note] huge non-date token",
    "short",
    "",
]

SLOW_EDGE = [
    "# Time: 231030 12:40:21",
    "SET timestamp=notanumber;",  # pos 0: kept as text (position quirk)
    "SELECT 1;",
    "# Time: 991340 99:99:99",  # out-of-range Time line -> NULL ts
    "SELECT 2;",
    "# Time: 231030 12:41:00",
    "SELECT 3;",
]

# 'use' line shifts the garbage SET to position 1: the reference would
# crash on int('notanumber') (C6 aborts the run); this engine skips the
# line and records NULL -- fix-with-flag divergence (SURVEY.md section 7)
SLOW_GARBAGE_SET = [
    "# Time: 231030 12:40:21",
    "use shop;",
    "SET timestamp=notanumber;",
    "SELECT 1;",
    "# Time: 231030 12:41:00",
    "SELECT 2;",
]


@pytest.fixture()
def ansi_on(spark):
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", "false")


def test_error_parse_ansi_on_matches_simulator(ansi_on):
    spark = ansi_on
    df = make_conv(spark, EDGE_LINES)
    entries = assemble_error_entries(
        parse_error_log_lines(df), mode="strict"
    ).orderBy("entry_id").collect()
    expected = simulate_error_log(EDGE_LINES)
    assert len(entries) == len(expected)
    for row, exp in zip(entries, expected):
        assert str(row.ts_epoch) == exp["timestamp"]
        assert (row.message or "") == exp["_text"]


def test_slow_parse_ansi_on_matches_simulator(ansi_on):
    spark = ansi_on
    df = make_conv(spark, SLOW_EDGE)
    got = parse_slow_log(df).orderBy("entry_id").collect()
    expected = simulate_slow_log(SLOW_EDGE)
    assert [r.query_text_raw for r in got] == [e["query_text"] for e in expected]
    assert got[0].set_timestamp is None  # pos-0 SET is text, never harvested
    assert got[1].ts_epoch is None  # unparseable '# Time:' -> NULL, no raise


def test_slow_garbage_set_timestamp_nulls(ansi_on):
    """Engine divergence (documented): garbage 'SET timestamp=' at position
    1 is skipped with NULL ts; the reference crashes on int()."""
    got = parse_slow_log(make_conv(ansi_on, SLOW_GARBAGE_SET)).collect()
    assert len(got) == 1
    assert got[0].set_timestamp is None
    assert got[0].query_text == "SELECT 1;"


def test_pipeline_ansi_on(ansi_on, transcripts):
    from mariadb_to_graylog_spark.plans.pipeline import build_routed

    routed = build_routed(transcripts)
    n = routed.count()
    assert n > 0

@pytest.mark.parametrize(
    "qname",
    ["decontaminate", "winnow_overlap", "dedup_groups", "multimodal_meta",
     "dedup_lsh_estimate", "curation_pipeline", "token_percentiles",
     # round 4: computed-slice (registrable_domain, gram windows),
     # posexplode/split, diagonal windows, distributed gram join
     "substring_pairs", "substring_run_extents", "paragraph_stats",
     "paragraph_dedup", "url_extract", "source_reputation",
     "domain_reputation", "decontaminate_bucketed",
     # round 5: positioned-gram eval join + diagonal windows; paragraph
     # units -> LSH-verified one-hop neighborhood; interval-union coverage
     "decontaminate_extents", "paragraph_near_stats", "verbatim_coverage",
     "trim_verbatim", "token_rarity", "sample_quota", "domain_lang_mix",
     "quality_dup_calibration", "source_overlap", "cdc_chunk_stats",
     # round 6: confusable-fold LSH; suffix-cumulative threshold sweep;
     # vs-eval-set coverage/trim (semi-join cover intervals)
     "crosslingual_near_dup", "quality_threshold_sweep",
     "decontaminate_coverage", "trim_contaminated",
     "decontaminate_coverage_bucketed", "curation_trim_pipeline",
     "trim_loss_by_source", "novelty_by_batch", "dedup_rate_sampled",
     "unigram_surprisal", "incremental_dedup",
     # round 6b: integer-div packing windows; sqrt/ppm mixture rates;
     # keep-best window over CC labels; k-means bucket pair scan
     "pack_sequences", "source_mixture", "dedup_keep_best",
     "dup_cluster_hist", "semantic_dedup", "training_manifest", "knn_pq",
     "token_fertility", "key_skew", "corpus_accounting", "knn_ivfpq",
     # round 6c: epoch-second lag windows (timestamp_ntz cast under ANSI);
     # md5-slice conv + mod under ANSI
     "session_stats", "event_transitions", "bloom_prefilter",
     "cluster_source_mix", "embedding_drift", "prefix_dup_stats",
     "padding_waste", "data_split",
     "fuzzy_decontam", "bpe_merges", "bigram_novelty", "lsh_planner",
     "vocab_coverage",
     # round 6d: SRP sign folds + broadcast bucket probe under ANSI;
     # rare-gram candidate join + containment arithmetic
     "semantic_decontam", "containment_pairs",
     # ln/round micro-nat folds + % bucketing under ANSI; paragraph
     # explode + window ties + integer div
     "dsir_weights", "paragraph_lang_mix",
     # minhash fold + struct band keys + best-match struct min; URL
     # regexp pieces + HOF param filter/sort
     "incremental_neardup", "url_variants",
     # Arrow decode + integer pool (no SQL expr risk, but pins parity);
     # regexp-chain extraction + div ppm
     "image_ahash_groups", "html_extract", "audio_fp_groups",
     "contamination_report", "nfc_dedup", "pack_segments",
     "web_ingest_pipeline", "json_props", "tfidf_keywords",
     "timeseries_gapfill", "char_entropy", "lang_confusion",
     "dup_cluster_provenance"],
)
def test_training_queries_ansi_parity(spark, qname):
    """Training operators (the parametrize list above tracks every round's
    additions) must return IDENTICAL rows with ANSI on and off
    (slice/element_at/cast edges are where ANSI bites)."""
    import mariadb_to_graylog_spark.entry_queries as eq

    sf = "/root/testdata/sf0.001"
    fn = eq.ALL_QUERIES[qname]
    off = sorted(tuple(r) for r in fn(spark, sf).collect())
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        on = sorted(tuple(r) for r in fn(spark, sf).collect())
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
    assert on == off and len(off) > 0
