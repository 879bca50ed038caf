"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship error-log parse->enrich query at
sf0.001; ``queries()`` maps every implemented operator from SURVEY.md
section 2 (plus the training-data operators) to a (spark, sf_dir) callable;
``oracle_sql()`` holds the DuckDB twins.  See
mariadb_to_graylog_spark/entry_queries.py for the per-query operator map.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mariadb_to_graylog_spark import entry_queries as _eq  # noqa: E402


def _prep(spark: SparkSession) -> None:
    """Pin the runtime confs the engine's semantics assume, whatever the
    caller's session defaults are: UTC timestamps (the DuckDB oracle renders
    naive-UTC) and permissive non-ANSI eval (malformed input -> NULL, the
    reference never aborts on bad lines)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _prep(spark)
    return _eq.q_errorlog_gelf(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _prep(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in _eq.ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(_eq.ALL_ORACLES)
