"""Eventlog file-format compatibility tests (C1/C2)."""

from __future__ import annotations

import pytest

from mariadb_to_graylog_spark.sources.eventlog_compat import (
    EventlogCompat,
    last_coordinate,
)


def test_append_and_resume(tmp_path):
    p = str(tmp_path / "eventlog")
    log = EventlogCompat(p)
    log.log_coordinates(10, "conv-000001")
    log.log_coordinates(25, "conv-000001")
    log.log_coordinates(7, "conv-000002")
    log.close()
    assert last_coordinate(p) == (7, "conv-000002")
    # append mode: reopening keeps history (eventlog.py:105-107)
    log2 = EventlogCompat(p)
    log2.log_coordinates(30, "conv-000002")
    log2.close()
    assert last_coordinate(p) == (30, "conv-000002")
    assert len(open(p).read().splitlines()) == 4


def test_truncate_and_separator_validation(tmp_path):
    p = str(tmp_path / "eventlog")
    log = EventlogCompat(p)
    log.log_coordinates(1, "a")
    log.close()
    log = EventlogCompat(p, truncate=True)
    with pytest.raises(ValueError):
        log.log_coordinates(2, "bad:source")
    log.close()
    assert last_coordinate(p) is None


def test_rotate(tmp_path):
    p = str(tmp_path / "eventlog")
    log = EventlogCompat(p)
    log.log_coordinates(5, "c")
    log.rotate()
    log.log_coordinates(6, "c")
    log.close()
    # post-rotate file contains only post-rotate lines; tmp removed
    assert last_coordinate(p) == (6, "c")
    assert len(open(p).read().splitlines()) == 1
    assert not (tmp_path / "eventlog.tmp").exists()
