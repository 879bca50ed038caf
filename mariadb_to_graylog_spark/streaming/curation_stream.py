"""Streaming corpus curation: incremental document ingestion through the
same gates as the batch curation pipeline -- cross-batch exact dedup,
quality scoring, benchmark decontamination -- routed to per-decision
output partitions (the GELF failover router's shape applied to training
data).

Streaming-specific shapes:

* **Dedup is stateful**: ``dropDuplicates`` on the md5 text key keeps one
  32-char hash per distinct document ever seen (unbounded but tiny state).
  When documents carry event time, ``curate_watermarked`` bounds the state
  with ``dropDuplicatesWithinWatermark`` -- the 10^12-doc ingest shape,
  trading re-admission of out-of-window dups (see its docstring).
* **Decontamination is stateless**: the eval corpus is small by
  definition, so its distinct gram-hash set broadcasts into an Arrow UDF
  (``contamination_flag_udf``) -- no explode, no aggregation, no shuffle,
  which is what lets the whole stream stay in append mode.
* **Routing is a column**, and the file sink partitions by it --
  kept / low_quality / contaminated (plus trimmed, in salvage mode) land
  in separate directories with exactly-once file-sink semantics.
* **Salvage mode** (``trim_hashes``): instead of dropping a contaminated
  document whole, the eval-shared spans are excised row-locally
  (``contamination_trim_udf`` -- still stateless, still append-mode) and
  the residual re-enters the quality gate; survivors route to
  ``trimmed`` with the excised text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mariadb_to_graylog_spark.operators import textstats as tx
from mariadb_to_graylog_spark.operators.decontam import contamination_flag_udf


def _score_and_route(
    deduped: DataFrame,
    eval_hashes: set[int],
    quality_threshold: float,
    n: int,
    trim_hashes: "set[str] | Broadcast | None" = None,
) -> DataFrame:
    """Shared post-dedup tail of both curation variants: quality score,
    contamination flag, decision ladder.  ONE definition so the bounded-
    and unbounded-state paths can never silently diverge.

    With ``trim_hashes`` (full-md5 gram digests,
    ``eval_gram_set(..., full_md5=True)``, OR a ``Broadcast`` handle --
    see below) the flow becomes salvage-not-drop: ONE ``contamination_trim_udf`` pass replaces the
    flag (contaminated <=> any token removed -- same membership, exact
    128-bit identity since this path REWRITES text), quality is scored on
    the SURVIVING text (identical to the raw score for clean docs --
    the score only counts token/stopword/punct occurrences, which
    normalization preserves), and a contaminated doc whose residual still
    passes the gate routes to a new ``trimmed`` decision with its text
    replaced by the trimmed stream; husks and low-residual docs stay
    ``contaminated``.  Adds an ``n_tokens_removed`` accounting column;
    without ``trim_hashes`` the schema is unchanged.

    Long-lived drivers that rebuild the plan (stream restarts,
    re-curated batches) should NOT pass the raw set every time -- each
    build would re-broadcast the full-md5 set and leak it for the
    application lifetime (``contamination_trim_udf``'s documented
    lifecycle).  Instead build the udf once, keep its handle, and pass
    the handle as ``trim_hashes``::

        u = contamination_trim_udf(hashes, n)      # ships the set once
        curate(docs, ..., trim_hashes=u.eval_broadcast)   # every rebuild
        ...
        u.eval_broadcast.unpersist()               # when done

    The handle is validated downstream (tagged ('md5', n, set); a flag-
    udf handle or an ``n`` mismatch raises)."""
    if trim_hashes is not None:
        from pyspark.broadcast import Broadcast

        from mariadb_to_graylog_spark.operators.decontam import (
            contamination_trim_udf,
        )

        if isinstance(trim_hashes, Broadcast):
            trim = contamination_trim_udf(eval_broadcast=trim_hashes, n=n)
        else:
            trim = contamination_trim_udf(trim_hashes, n)
        salvage = (
            F.col("_t.n_tokens_removed") < F.col("_t.n_tokens")
        ) & (F.col("quality") >= quality_threshold)
        return (
            deduped.withColumn("_t", trim(F.col("text")))
            .withColumn("contaminated", F.col("_t.n_tokens_removed") > 0)
            .withColumn("quality", tx.quality_score(F.col("_t.trimmed_text")))
            .withColumn(
                "decision",
                F.when(
                    ~F.col("contaminated"),
                    F.when(F.col("quality") >= quality_threshold, "kept").otherwise(
                        "low_quality"
                    ),
                )
                .when(salvage, "trimmed")
                .otherwise("contaminated"),
            )
            .withColumn(
                "text",
                F.when(
                    F.col("decision") == "trimmed", F.col("_t.trimmed_text")
                ).otherwise(F.col("text")),
            )
            .withColumn("n_tokens_removed", F.col("_t.n_tokens_removed"))
            .drop("_t", "_h")
        )
    flag = contamination_flag_udf(eval_hashes, n)
    return (
        deduped.withColumn("quality", tx.quality_score(F.col("text")))
        .withColumn("contaminated", flag(F.col("text")))
        .withColumn(
            "decision",
            F.when(F.col("contaminated"), "contaminated")
            .when(F.col("quality") < quality_threshold, "low_quality")
            .otherwise("kept"),
        )
        .drop("_h")
    )


def curate(
    docs: DataFrame,
    eval_hashes: set[int],
    quality_threshold: float = 0.5,
    n: int = 13,
    trim_hashes: "set[str] | Broadcast | None" = None,
) -> DataFrame:
    """The per-row curation transform (works on batch AND streaming
    DataFrames -- the batch-equivalence test runs it both ways):
    dedup on md5(text), score, flag, decide.  ``trim_hashes`` switches
    the contamination gate to salvage-not-drop (see
    ``_score_and_route``)."""
    deduped = docs.withColumn("_h", F.md5("text")).dropDuplicates(["_h"])
    return _score_and_route(deduped, eval_hashes, quality_threshold, n, trim_hashes)


def curate_watermarked(
    docs: DataFrame,
    eval_hashes: set[int],
    quality_threshold: float = 0.5,
    n: int = 13,
    event_time_col: str = "ts",
    delay: str = "10 minutes",
    trim_hashes: "set[str] | Broadcast | None" = None,
) -> DataFrame:
    """``curate`` with BOUNDED dedup state: ``dropDuplicatesWithinWatermark``
    on the md5 text key evicts a document's dedup record once the
    watermark (max event time - ``delay``) passes its event time, so
    state is O(docs per delay window) instead of O(all docs ever seen).

    The traded-away guarantee is explicit: a duplicate arriving AFTER its
    original's state was evicted is RE-ADMITTED (tested).  That is the
    right trade at ingest scale -- streams deliver dups in bursts
    (retries, double-polls) that land well inside any sane window, and
    the global guarantee belongs to the periodic BATCH dedup pass over
    the accumulated table, not the ingest path.  The unbounded ``curate``
    remains the default for streams small enough to afford exact state."""
    deduped = (
        docs.withWatermark(event_time_col, delay)
        .withColumn("_h", F.md5("text"))
        .dropDuplicatesWithinWatermark(["_h"])
    )
    return _score_and_route(deduped, eval_hashes, quality_threshold, n, trim_hashes)


def start_curation_stream(
    docs_stream: DataFrame,
    out_base: str,
    checkpoint_dir: str,
    eval_hashes: set[int],
    quality_threshold: float = 0.5,
    trigger_ms: int = 1000,
    n: int = 13,
    trim_hashes: "set[str] | Broadcast | None" = None,
) -> StreamingQuery:
    routed = curate(docs_stream, eval_hashes, quality_threshold, n, trim_hashes)
    return (
        routed.writeStream.format("parquet")
        .option("path", out_base)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("decision")
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .outputMode("append")
        .start()
    )
