"""Reference-format eventlog compatibility (SURVEY.md C1/C2).

The reference checkpoints consumption as an append-only text file of
``<coordinate>:<sourcelog>`` lines (lib_consumer/eventlog.py:14-23,105-107),
resuming from the last line's first field (``:73-83``).  This engine's real
checkpoint is the lineage parquet table (sources/transcripts.py); this
module reads/writes the reference's *file format* so an operator migrating
from the reference can keep their tooling:

* coordinate = max consumed ``turn_idx``; sourcelog = ``conv_id``
  (the (file, byte-offset) pair generalized to (conv, turn));
* ``rotate()`` implements the close -> rename .tmp -> reopen -> unlink
  sequence (eventlog.py:113-153) with the reference's latent
  ``os.rename.unlink`` AttributeError (:137) fixed -- divergence noted;
* the separator rule (path must not contain ':') mirrors the reference's
  validation (mariadb-log-consumer.py:306-307).
"""

from __future__ import annotations

import os
import threading
from pathlib import Path

SEPARATOR = ":"  # eventlog.py:23


class EventlogCompat:
    """Thread-safe: ``rotate()`` may be called from a signal handler on the
    driver main thread while a streaming foreachBatch thread is writing
    coordinates -- the lock is this engine's version of the reference's
    deferred-request critical section (mariadb-log-consumer.py:528-545)."""

    def __init__(self, path: str, truncate: bool = False):
        self._path = Path(path)
        self._lock = threading.Lock()
        mode = "w" if truncate else "a"
        self._handle = open(self._path, mode, encoding="utf-8")

    def log_coordinates(self, coordinate: int, source: str) -> None:
        if SEPARATOR in source:
            raise ValueError(f"source must not contain {SEPARATOR!r}")  # :306-307
        with self._lock:
            self._handle.write(f"{coordinate}{SEPARATOR}{source}\n")
            self._handle.flush()

    def rotate(self) -> None:
        """close -> rename to .tmp -> reopen fresh -> unlink tmp."""
        tmp = self._path.with_name(self._path.name + ".tmp")
        with self._lock:
            self._handle.close()
            os.rename(self._path, tmp)
            self._handle = open(self._path, "w", encoding="utf-8")
            os.unlink(tmp)  # the reference's os.rename.unlink crash (:137), fixed

    def close(self) -> None:
        with self._lock:
            self._handle.close()


def last_coordinate(path: str) -> tuple[int, str] | None:
    """Resume read: last line -> (coordinate, source) (eventlog.py:73-83)."""
    p = Path(path)
    if not p.exists():
        return None
    last = None
    with open(p, encoding="utf-8") as fh:
        for line in fh:
            if line.strip():
                last = line.strip()
    if last is None:
        return None
    coord, _, source = last.partition(SEPARATOR)
    return int(coord), source


def write_from_lineage(lineage_rows, path: str, truncate: bool = False) -> None:
    """Export a lineage table (conv_id, max_turn_idx rows) to the
    reference's file format -- driver-side, for migration tooling only."""
    log = EventlogCompat(path, truncate=truncate)
    try:
        for row in lineage_rows:
            log.log_coordinates(row.max_turn_idx, row.conv_id)
    finally:
        log.close()
