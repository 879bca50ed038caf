"""End-to-end test of the spark-submit job entry point (jobs/run_pipeline.py)
in batch mode with lineage + metrics + resume."""

from __future__ import annotations

from pyspark.sql import functions as F

from jobs.run_pipeline import main as job_main


def test_job_batch_with_lineage_and_resume(spark, transcripts, tmp_path):
    src_path = str(tmp_path / "transcripts")
    transcripts.write.parquet(src_path)
    out1 = str(tmp_path / "sinks1")
    lineage = str(tmp_path / "lineage")
    metrics = str(tmp_path / "metrics")

    rc = job_main(
        [
            "--input", src_path, "--output", out1,
            "--lineage", lineage, "--metrics", metrics,
        ]
    )
    assert rc == 0
    written = spark.read.parquet(out1)
    n1 = written.count()
    assert n1 > 0
    assert spark.read.parquet(metrics).agg(F.sum("n")).collect()[0][0] == n1
    lin = spark.read.parquet(lineage)
    assert lin.count() > 0
    assert {"run_id", "conv_id", "max_turn_idx", "rows_in", "rows_routed"} <= set(
        lin.columns
    )

    # resume run over the same input: everything consumed -> nothing routed
    out2 = str(tmp_path / "sinks2")
    rc = job_main(
        [
            "--input", src_path, "--output", out2,
            "--lineage", lineage, "--resume",
        ]
    )
    assert rc == 0
    try:
        n2 = spark.read.parquet(out2).count()
    except Exception:
        n2 = 0  # no files written at all
    assert n2 == 0
