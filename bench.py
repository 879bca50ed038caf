#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, "turns_per_sec": ...}

The headline metric is the north-rule pipeline: parse -> enrich -> route ->
aggregate over a synthesized transcript table sized to the SF (deterministic
seed, written once to a temp dir and reused).  A tiny warmup run of the same
plan precedes the timed run so the measurement is steady-state throughput
(Spark caches generated code by source text; first-run janino compilation of
the regexp-heavy stages otherwise dominates at small SF).

Bench-scale tuning (sized-down analogues of cluster settings, see
BENCH/BASELINE.md): input splits 4MB (>=3 tasks/core on a ~100MB table;
at 100 TB the default 128MB is right), AQE advisory partition 8MB, shuffle
partitions 3x cores.

Modes:
  python bench.py                    # full suite, one JSON line
  python bench.py --job pipeline     # pipeline only (scaling evidence runs)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BENCH_TMP = os.environ.get("SPARK_GRAFT_BENCH_TMP", "/tmp/spark_graft_bench")

CONVS_PER_SF = 100_000  # ~50 turns/conv -> sf0.1 = ~5e5 turns, sf1 = ~5e6
MEAN_TURNS = 20


def _sf_of(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.0


def bench_spark(
    cpus: int | None = None,
    app: str = "bench",
    shuffle_partitions: int | None = None,
    event_log_dir: str | None = None,
):
    from mariadb_to_graylog_spark.session import get_spark

    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    # scaling-evidence runs fix the partition count across core levels so
    # per-partition work (sort sizes, spill behavior) is held constant and
    # only the executor-thread count varies
    parts = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "0")) or max(3 * n, 3)
    conf = {
        "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(8 * 1024 * 1024),
    }
    if event_log_dir:
        # per-stage task metrics for the scaling evidence (parsed by
        # tools/stage_metrics.py after the run)
        Path(event_log_dir).mkdir(parents=True, exist_ok=True)
        conf["spark.eventLog.enabled"] = "true"
        conf["spark.eventLog.dir"] = f"file://{event_log_dir}"
        conf["spark.eventLog.rolling.enabled"] = "false"  # one plain JSON file
        conf["spark.eventLog.compress"] = "false"
    return get_spark(
        app_name=app, cpus=n, shuffle_partitions=parts, extra_conf=conf
    )


def ensure_transcripts(spark, sf: float, n_convs: int | None = None) -> str:
    n_convs = n_convs or max(64, int(CONVS_PER_SF * sf))
    path = f"{BENCH_TMP}/transcripts_sf{sf}_{n_convs}"
    if not (Path(path) / "_SUCCESS").exists():
        from mariadb_to_graylog_spark.datagen import generate_transcripts

        df = generate_transcripts(spark, n_convs=n_convs, mean_turns=MEAN_TURNS, seed=42)
        df.write.mode("overwrite").parquet(path)
    return path


def ensure_warmup_table(spark) -> str:
    path = f"{BENCH_TMP}/transcripts_warm"
    if not (Path(path) / "_SUCCESS").exists():
        from mariadb_to_graylog_spark.datagen import generate_transcripts

        generate_transcripts(spark, n_convs=32, mean_turns=4, seed=7).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def run_pipeline_job(spark, transcripts_path: str) -> tuple[float, int, dict]:
    """The north-rule job, one pass: routed events -> combined
    (sink, source, severity) counts.  No persist (see combined_counts)."""
    from mariadb_to_graylog_spark.operators.aggregates import combined_counts
    from mariadb_to_graylog_spark.plans.pipeline import build_routed

    transcripts = spark.read.parquet(transcripts_path)
    n_turns = transcripts.count()  # excluded from the timed section

    t_epoch0 = time.time() * 1000  # stage-submission window for stage_metrics
    t0 = time.perf_counter()
    routed = build_routed(transcripts)
    rows = combined_counts(routed).collect()
    sec = time.perf_counter() - t0
    run_pipeline_job.last_window = (t_epoch0, time.time() * 1000)

    sinks: dict[str, int] = {}
    hist: dict[str, int] = {}
    for r in rows:
        sinks[r.sink] = sinks.get(r.sink, 0) + r.n
        hist[f"{r.source}/{r.severity}"] = hist.get(f"{r.source}/{r.severity}", 0) + r.n
    return sec, n_turns, {"n_routed": sum(sinks.values()), "sinks": sinks, "hist": hist}


QUERY_NAMES = [
    "errorlog_entries",
    "errorlog_gelf",
    "slowlog_entries",
    "entry_islands",
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    "crosslingual_near_dup",
    "dedup_groups",
    "simhash_banded",
    "embed_neardup_lsh",
    "winnow_overlap",
    "substring_pairs",
    "substring_run_extents",
    "verbatim_coverage",
    "trim_verbatim",
    "paragraph_stats",
    "paragraph_dedup",
    "paragraph_near_stats",
    "decontaminate_extents",
    "decontaminate_coverage",
    "decontaminate_coverage_bucketed",
    "trim_contaminated",
    "trim_loss_by_source",
    "novelty_by_batch",
    "dedup_rate_sampled",
    "unigram_surprisal",
    "incremental_dedup",
    "bloom_prefilter",
    "prefix_dup_stats",
    "session_stats",
    "event_transitions",
    "pack_sequences",
    "padding_waste",
    "data_split",
    "fuzzy_decontam",
    "semantic_decontam",
    "containment_pairs",
    "incremental_neardup",
    "url_variants",
    "image_ahash_groups",
    "html_extract",
    "audio_fp_groups",
    "nfc_dedup",
    "pack_segments",
    "web_ingest_pipeline",
    "json_props",
    "tfidf_keywords",
    "timeseries_gapfill",
    "char_entropy",
    "lang_confusion",
    "dsir_weights",
    "paragraph_lang_mix",
    "bpe_merges",
    "bigram_novelty",
    "lsh_planner",
    "vocab_coverage",
    "dedup_keep_best",
    "semantic_dedup",
    "cluster_source_mix",
    "embedding_drift",
    "knn_pq",
    "knn_ivfpq",
    "token_rarity",
    "cdc_chunk_stats",
    "url_extract",
    "source_reputation",
    "dedup_lsh_estimate",
    "decontaminate",
    "curation_pipeline",
    "dedup_exact",
    "knn_bruteforce",
    "knn_ivf_trained",
    "lang_id",
    "quality_threshold_sweep",
    "token_percentiles",
    "tpch_pricing",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--n-convs", type=int, default=None)
    ap.add_argument("--job", choices=["full", "pipeline"], default="full")
    ap.add_argument(
        "--trials",
        type=int,
        default=3,
        help="timed trials per query, BEST kept (this host's co-tenant "
        "drift reaches 3-4x between runs; single-trial deltas are noise)",
    )
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--skip-queries", action="store_true")
    ap.add_argument(
        "--event-log-dir",
        default=None,
        help="enable Spark event logging here; pipeline JSON gains app_id + timed_window",
    )
    args = ap.parse_args()

    spark = bench_spark(
        args.cpus,
        shuffle_partitions=args.shuffle_partitions,
        event_log_dir=args.event_log_dir,
    )
    sf = _sf_of(args.sf_dir)

    tpath = ensure_transcripts(spark, sf, args.n_convs)
    warm = ensure_warmup_table(spark)
    run_pipeline_job(spark, warm)  # codegen + JIT warmup, steady-state measure

    pipe_sec, n_turns, detail = run_pipeline_job(spark, tpath)
    for _ in range(max(0, args.trials - 1) if args.job == "full" else 0):
        s, _, _ = run_pipeline_job(spark, tpath)
        pipe_sec = min(pipe_sec, s)

    if args.job == "pipeline":
        extra = {}
        if args.event_log_dir:
            extra = {
                "app_id": spark.sparkContext.applicationId,
                "timed_window": list(run_pipeline_job.last_window),
            }
            spark.stop()  # flush + finalize the event log file
        print(
            json.dumps(
                {
                    "sec": round(pipe_sec, 3),
                    "turns": n_turns,
                    "turns_per_sec": round(n_turns / pipe_sec, 1),
                    **detail,
                    **extra,
                }
            )
        )
        return 0

    queries: dict[str, float] = {"pipeline_e2e": round(pipe_sec, 3)}
    query_rows: dict[str, int] = {}
    if not args.skip_queries:
        import mariadb_to_graylog_spark.entry_queries as eq

        for name in QUERY_NAMES:
            fn = eq.ALL_QUERIES[name]
            # full-plan warmup run (limit(1) compiles a DIFFERENT plan and
            # leaves the real one cold: observed 3-4x first-run noise);
            # then BEST of --trials steady-state runs (co-tenant drift)
            fn(spark, args.sf_dir).count()
            best = None
            for _ in range(max(1, args.trials)):
                t0 = time.perf_counter()
                query_rows[name] = fn(spark, args.sf_dir).count()
                sec = time.perf_counter() - t0
                best = sec if best is None else min(best, sec)
            queries[name] = round(best, 3)

    extras: dict[str, float] = {}
    if not args.skip_queries:
        # IVF is approximate by design: report recall@3 vs brute force on
        # the same query set so the speed/recall tradeoff is visible
        from pyspark.sql import functions as F

        from mariadb_to_graylog_spark.operators.similarity import knn_bruteforce

        e = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
        brute = {
            (r.query_id, r.neighbor_id)
            for r in knn_bruteforce(e, F.col("vec_id") < 10, k=3).collect()
        }
        ivf = {
            (r.query_id, r.neighbor_id)
            for r in eq.ALL_QUERIES["knn_ivf_trained"](spark, args.sf_dir).collect()
        }
        extras["ivf_recall_at3"] = round(len(brute & ivf) / max(len(brute), 1), 4)

        # full recall CURVE over the nprobe knob (probe cost scales
        # linearly with nprobe; this documents what each step buys) --
        # same trained index parameters as the oracle query above
        from mariadb_to_graylog_spark.operators.similarity import knn_ivf_trained

        curve = {}
        for nprobe in (1, 2, 4):
            if nprobe == 2:
                got = ivf  # the oracle query above IS the nprobe=2 point
            else:
                got = {
                    (r.query_id, r.neighbor_id)
                    for r in knn_ivf_trained(
                        e,
                        F.col("vec_id") < 10,
                        n_centroids=16,
                        iters=3,
                        dim=64,
                        k=3,
                        nprobe=nprobe,
                    ).collect()
                }
            curve[f"nprobe_{nprobe}"] = round(
                len(brute & got) / max(len(brute), 1), 4
            )
        extras["ivf_recall_curve"] = curve

        # PQ recall over the rerank knob: raw ADC vs the two-stage
        # (shortlist -> exact-rerank) path; rerank cost scales with R/N
        # of the corpus touched at full precision
        from mariadb_to_graylog_spark.operators.similarity import (
            pq_adc_topk,
            train_pq,
        )

        books = train_pq(e, m=4, ksub=8, iters=2, dim=64)
        pq_curve = {}
        for rr in (0, 10, 50):
            got = {
                (r.query_id, r.neighbor_id)
                for r in pq_adc_topk(
                    e, F.col("vec_id") < 10, books, dim=64, k=3, rerank=rr
                ).collect()
            }
            pq_curve[f"rerank_{rr}"] = round(
                len(brute & got) / max(len(brute), 1), 4
            )
        extras["pq_recall_curve"] = pq_curve

        # IVF-PQ (residual PQ under a coarse quantizer) vs raw PQ at the
        # SAME code budget (m=4, ksub=8) and same rerank=50: documents
        # what quantizing residuals (lower variance) buys in recall.
        # The oracle query IS the rerank=50 point; rerank=0 shows raw
        # residual-ADC quality before the exact pass.
        from mariadb_to_graylog_spark.operators.similarity import knn_ivfpq

        ivfpq_curve = {}
        for rr in (0, 50):
            if rr == 50:
                got = {
                    (r.query_id, r.neighbor_id)
                    for r in eq.ALL_QUERIES["knn_ivfpq"](
                        spark, args.sf_dir
                    ).collect()
                }
            else:
                got = {
                    (r.query_id, r.neighbor_id)
                    for r in knn_ivfpq(
                        e,
                        F.col("vec_id") < 10,
                        n_coarse=8,
                        coarse_iters=2,
                        m=4,
                        ksub=8,
                        pq_iters=2,
                        dim=64,
                        k=3,
                        nprobe=2,
                        rerank=rr,
                    ).collect()
                }
            ivfpq_curve[f"rerank_{rr}"] = round(
                len(brute & got) / max(len(brute), 1), 4
            )
        extras["ivfpq_recall_curve"] = ivfpq_curve

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "parse_route_aggregate_suite",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "turns": n_turns,
                "turns_per_sec": round(n_turns / pipe_sec, 1),
                "n_routed": detail["n_routed"],
                "query_rows": query_rows,
                "trials": max(1, args.trials),
                **extras,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
