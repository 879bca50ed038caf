"""Streaming ingestion NEAR-dup gate: every micro-batch of newly crawled
documents is LSH-probed against the EXISTING corpus's materialized
MinHash index, decisions land in per-decision parquet partitions.

Shape: ``foreachBatch`` (the gate is a join+aggregate against a static
side -- not expressible as a pure streaming append), with the corpus
index built ONCE at stream start (``dedup.build_neardup_index`` +
persist) so each trigger pays the batch's own signature pass, the bucket
probe, and a corpus-text fetch FOR CANDIDATE IDS ONLY -- since r7 the
verify derives corpus grams above the candidate join (round-6 advice:
the earlier shape re-derived char_ngrams over every corpus document per
trigger even with the pre-built index).  State-free BY DESIGN: the gate compares batch vs
CORPUS; a near-dup pair arriving in two different micro-batches (neither
in the corpus yet) is not caught here -- that is the batch near-dedup
pass's job over the accumulated table, exactly like the watermarked
curation stream's re-admission trade (curation_stream.py), and the
exact-md5 cross-batch lane is already covered there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mariadb_to_graylog_spark.operators.dedup import (
    build_neardup_index,
    incremental_neardup,
)


def start_ingest_gate_stream(
    batch_stream: DataFrame,
    corpus: DataFrame,
    out_base: str,
    checkpoint_dir: str,
    trigger_ms: int = 1000,
    shingle_n: int = 4,
    bands: int = 4,
    rows_per_band: int = 8,
    n: int = 3,
    threshold: float = 0.5,
) -> StreamingQuery:
    """Start the gate: ``batch_stream`` must carry (doc_id, text).
    Output rows: (doc_id, decision, match_id, jaccard, batch_id),
    partitioned by ``decision`` -- the 'kept' partition is the crawl
    that survives, 'near_duplicate' carries its corpus match for audit.

    Exactly-once per micro-batch rides the checkpoint: a replayed batch
    re-runs the same deterministic gate and appends under the same
    batch_id (dedup on (batch_id, doc_id) downstream if the sink must
    be idempotent -- parquet append is at-least-once under replay,
    stated not hidden)."""
    index = build_neardup_index(
        corpus, shingle_n=shingle_n, bands=bands, rows_per_band=rows_per_band
    ).persist()
    index.count()  # materialize once, before the first trigger

    def _gate(bdf: DataFrame, batch_id: int) -> None:
        if bdf.isEmpty():
            return
        decisions = incremental_neardup(
            corpus,
            bdf,
            shingle_n=shingle_n,
            bands=bands,
            rows_per_band=rows_per_band,
            n=n,
            threshold=threshold,
            corpus_buckets=index,
        ).withColumn("batch_id", F.lit(batch_id))
        decisions.write.mode("append").partitionBy("decision").parquet(out_base)

    return (
        batch_stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .start()
    )
