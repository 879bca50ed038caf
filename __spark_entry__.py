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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _eq.q_errorlog_gelf(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_eq.ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_eq.ALL_ORACLES)
