"""Deterministic synthetic transcript generator.

Produces the primary input table from BASELINE.json's ``input_hint``::

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

Each conversation's ``text`` column, read in ``turn_idx`` order, is a valid
MariaDB error-log or slow-log fragment (FIXTURES.md sections 3-4), so the
reference parsers' semantics apply per-conversation exactly as they apply
per-file in the reference (one file == one conversation).

Generation is distributed: ``spark.range(n_convs)`` fans conversation ids
across executors and each conversation is synthesized inside a pandas batch
(``mapInPandas``), seeded by ``(seed, conv_id)`` -- the output is therefore
byte-identical at any parallelism level, which is itself one of the
correctness invariants we test (per-turn text equality under stable turn
ordering).

Turn counts are Zipf-skewed so a few hot conversations exercise the salted /
block-local entry-assembly path (see operators/assembly.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_ROLES = ["system", "user", "assistant", "tool"]
_TOOLS = ["bash", "search", "editor", "browser", None]

_F1_LEVELS = ["[Note]", "[Warning]", "[ERROR]", "[note]", "[NOTE]", "[Foo]"]
_F2_LEVELS = ["[ERROR]", "[Note]", "[Warning]"]

_ERROR_MESSAGES = [
    "WSREP: Read nil XID from storage engines, skipping position init",
    "InnoDB: Unable to lock ./ibdata1 error: 11",
    "Aborted connection {n} to db: 'test' user: 'app'",
    "InnoDB: Starting shutdown...",
    "mysqld got signal 6 ;",
    "Event Scheduler: Loaded {n} events",
    "short msg",  # < SHORT_MESSAGE_LENGTH, truncation boundary
    "Charset check café latin-1 détecté",  # non-ASCII -> http failover
    "Plugin 'FEEDBACK' is disabled.",
    "Server socket created on IP: '::'",
]

_CONTINUATIONS = [
    "Attempting backtrace. You can use the following information to find out",
    "where mysqld died. If you see no messages after this, something went",
    "terribly wrong...",
    "key_buffer_size=134217728",
    "read_buffer_size=131072",
]

_SLOW_HEADERS = [
    "/usr/sbin/mariadbd, Version: 10.6.12-MariaDB-log (MariaDB Server). started with:",
    "Tcp port: 3306  Unix socket: /run/mysqld/mysqld.sock",
    "Time                Id Command  Argument",
]

_SQL_TEMPLATES = [
    "SELECT * FROM orders WHERE customer_id = {n} AND status IN ('a','b','c')",
    "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > {n}.5",
    "UPDATE customer SET c_acctbal = c_acctbal + {n} WHERE c_custkey = {n2}",
    "INSERT INTO events (user_id, kind) VALUES ({n}, 'click')",
    "DELETE FROM sessions WHERE expires_at < {n}",
    "select count(*) from lineitem where l_quantity in ({n}, {n2}, 17)",
]

_EPOCH0 = datetime(2023, 10, 30, 12, 0, 0, tzinfo=timezone.utc)


def _gen_error_conv(rng: np.random.Generator, n_entries: int) -> list[str]:
    lines: list[str] = []
    t = _EPOCH0 + timedelta(seconds=int(rng.integers(0, 86400)))
    for _ in range(n_entries):
        t += timedelta(seconds=int(rng.integers(1, 90)))
        fmt = int(rng.integers(1, 3))
        msg = _ERROR_MESSAGES[int(rng.integers(0, len(_ERROR_MESSAGES)))]
        msg = msg.replace("{n}", str(int(rng.integers(1, 5000))))
        if fmt == 1:
            level = _F1_LEVELS[int(rng.integers(0, len(_F1_LEVELS)))]
            thread = int(rng.integers(0, 64))
            if rng.random() < 0.15:
                # single-digit time parts exercise the zfill path
                # (mariadb-log-consumer.py:655-656)
                time_s = f"{t.hour}:{t.minute}:{t.second}"
            else:
                time_s = t.strftime("%H:%M:%S")
            lines.append(f"{t.strftime('%Y-%m-%d')} {time_s} {thread} {level} {msg}")
        else:
            level = _F2_LEVELS[int(rng.integers(0, len(_F2_LEVELS)))]
            lines.append(f"{t.strftime('%y%m%d %H:%M:%S')} {level} {msg}")
        # 0-2 malformed continuation lines
        for _ in range(int(rng.integers(0, 3)) if rng.random() < 0.3 else 0):
            lines.append(_CONTINUATIONS[int(rng.integers(0, len(_CONTINUATIONS)))])
    return lines


def _gen_slow_conv(rng: np.random.Generator, n_entries: int) -> list[str]:
    lines: list[str] = list(_SLOW_HEADERS)
    t = _EPOCH0 + timedelta(seconds=int(rng.integers(0, 86400)))
    for _ in range(n_entries):
        t += timedelta(seconds=int(rng.integers(1, 90)))
        epoch = int(t.timestamp())
        lines.append("# Time: " + t.strftime("%y%m%d %H:%M:%S"))
        lines.append("# User@Host: app[app] @ localhost [127.0.0.1]")
        lines.append(
            f"# Thread_id: {int(rng.integers(1, 999))}  Schema: shop  QC_hit: "
            + ("Yes" if rng.random() < 0.2 else "No")
        )
        qt = rng.random() * 4.0
        lines.append(
            f"# Query_time: {qt:.6f}  Lock_time: {rng.random() / 100:.6f}  "
            f"Rows_sent: {int(rng.integers(0, 100))}  "
            f"Rows_examined: {int(rng.integers(0, 200000))}"
        )
        if rng.random() < 0.5:
            lines.append(
                f"# Rows_affected: {int(rng.integers(0, 10))}  "
                f"Bytes_sent: {int(rng.integers(100, 99999))}"
            )
        if rng.random() < 0.7:
            lines.append("use shop;")
        if rng.random() < 0.85:
            lines.append(f"SET timestamp={epoch};")
        n_sql = int(rng.integers(1, 4))
        for i in range(n_sql):
            sql = _SQL_TEMPLATES[int(rng.integers(0, len(_SQL_TEMPLATES)))]
            sql = sql.replace("{n2}", str(int(rng.integers(1, 9999))))
            sql = sql.replace("{n}", str(int(rng.integers(1, 9999))))
            lines.append(sql + ";")
            if i == 0 and rng.random() < 0.15:
                # '# '-prefixed SQL comment inside the SQL section stays SQL
                # (mariadb-log-consumer.py:925-933)
                lines.append("# index hint follows")
    return lines


def _conv_rows(conv: int, seed: int, mean_turns: int, slow_frac: float) -> pd.DataFrame:
    rng = np.random.default_rng([seed, conv])
    # Zipf-skewed conversation length: most convs near the mean, a hot few
    # many multiples of it (drives the skew-handling code paths).
    mult = min(int(rng.zipf(2.0)), 40)
    is_slow = rng.random() < slow_frac
    # slow convs need >=2 entries so at least one survives the reference's
    # trailing-entry drop (mariadb-log-consumer.py:992-993)
    n_entries = max(2 if is_slow else 1, int(mean_turns * mult) // (8 if is_slow else 2))
    lines = (
        _gen_slow_conv(rng, n_entries) if is_slow else _gen_error_conv(rng, n_entries)
    )
    n = len(lines)
    t0 = _EPOCH0 + timedelta(seconds=int(rng.integers(0, 10_000)))
    ts = [t0 + timedelta(seconds=i) for i in range(n)]
    roles = [_ROLES[int(rng.integers(0, 4))] for _ in range(n)]
    tools = [_TOOLS[int(rng.integers(0, 5))] for _ in range(n)]
    return pd.DataFrame(
        {
            "conv_id": [f"conv-{conv:06d}"] * n,
            "turn_idx": np.arange(n, dtype="int32"),
            "role": roles,
            "text": lines,
            "tool": pd.array(tools, dtype="object"),
            "ts": ts,
        }
    )


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 50,
    mean_turns: int = 8,
    seed: int = 42,
    slow_frac: float = 0.4,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcript table (see module docstring)."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for conv in pdf["id"].tolist():
                yield _conv_rows(int(conv), seed, mean_turns, slow_frac)

    return (
        spark.range(0, n_convs, numPartitions=min(parts, max(1, n_convs)))
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


def conv_lines_py(
    conv: int, seed: int = 42, mean_turns: int = 8, slow_frac: float = 0.4
) -> list[str]:
    """Driver-side view of one conversation's lines (test oracle support)."""
    return _conv_rows(conv, seed, mean_turns, slow_frac)["text"].tolist()
