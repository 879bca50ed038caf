"""Dimension tables for broadcast-join enrichment.

The reference's only lookup is the severity -> GELF level if-chain at
lib_consumer/gelf_message.py:36-47 ("ERROR"->"3", "WARNING"->"4",
"NOTE"->"6", else "UNKNOWN").  Here that mapping -- and the role/tool
enrichment dims mandated by the north-star -- are small DataFrames joined
with an explicit ``F.broadcast`` hint so the lookup never shuffles the fact
side, no matter how large it is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Exactly lib_consumer/gelf_message.py:40-45; UNKNOWN is applied as a
# post-join coalesce (gelf_message.py:47) so unmatched levels survive.
SEVERITY_ROWS = [("ERROR", "3"), ("WARNING", "4"), ("NOTE", "6")]

ROLE_ROWS = [
    # role, role_group, default_source
    ("system", "control", "error"),
    ("user", "human", "error"),
    ("assistant", "agent", "error"),
    ("tool", "agent", "slow"),
]

TOOL_ROWS = [
    # tool, tool_kind, sink_hint
    ("bash", "exec", "udp"),
    ("search", "io", "udp"),
    ("editor", "exec", "tcp"),
    ("browser", "io", "http"),
]


def severity_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SEVERITY_ROWS, "severity string, gelf_level string")


def role_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        ROLE_ROWS, "role string, role_group string, default_source string"
    )


def tool_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(TOOL_ROWS, "tool string, tool_kind string, sink_hint string")
