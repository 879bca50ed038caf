"""PySpark-native log/telemetry analytics engine.

A from-scratch rebuild of the capabilities of Vettabase/mariadb-to-graylog
(reference at /root/reference, studied for semantics only) as an idiomatic
PySpark pipeline: parse -> enrich -> route -> aggregate over tables of
multi-turn conversation/agent transcripts.

The reference is a single-threaded file-tailing consumer
(mariadb-log-consumer.py) that parses MariaDB error-log / slow-log lines into
GELF events and fans them out to Graylog sinks.  This package re-expresses
every one of its pipeline stages as DataFrame/SQL transformations (see
SURVEY.md section 2 for the operator inventory and the per-operator
citations), plus the large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing) that a 100 TB deployment needs.
"""

__version__ = "0.1.0"

from mariadb_to_graylog_spark.session import get_spark  # noqa: F401
