"""Signal handling e2e (SURVEY.md C4): the streaming job in a real
subprocess must rotate its eventlog on SIGHUP and stop gracefully (exit 0,
output intact) on SIGTERM -- the reference's deferred-request semantics
(mariadb-log-consumer.py:479-480,528-545) at micro-batch granularity."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_streaming_sighup_rotate_and_sigterm_graceful(spark, transcripts, tmp_path):
    src = str(tmp_path / "src")
    transcripts.write.parquet(src)
    out = str(tmp_path / "sinks")
    ckpt = str(tmp_path / "ckpt")
    evt = tmp_path / "consumer.eventlog"

    env = dict(os.environ, PYTHONPATH=str(REPO))
    proc = subprocess.Popen(
        [
            sys.executable, str(REPO / "jobs" / "run_pipeline.py"),
            "--input", src, "--output", out,
            "--stop", "NEVER", "--checkpoint", ckpt,
            "--eventlog-file", str(evt), "--eof-wait", "500",
        ],
        cwd=str(REPO), env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        # wait for the first micro-batch: coordinates appear in the eventlog
        deadline = time.time() + 120
        while time.time() < deadline:
            assert proc.poll() is None, "job died before first batch"
            if evt.exists() and evt.read_text().strip():
                break
            time.sleep(1)
        else:
            raise AssertionError("no coordinates within 120s")

        # SIGHUP -> rotate: fresh empty file (no new input -> no new lines)
        os.kill(proc.pid, signal.SIGHUP)
        deadline = time.time() + 30
        while time.time() < deadline:
            if evt.exists() and not evt.read_text().strip():
                break
            time.sleep(0.5)
        else:
            raise AssertionError("eventlog not rotated after SIGHUP")
        assert proc.poll() is None  # rotate must not stop the job

        # SIGTERM -> graceful stop at a batch boundary, exit 0
        os.kill(proc.pid, signal.SIGTERM)
        rc = proc.wait(timeout=120)
        assert rc == 0
    finally:
        if proc.poll() is None:
            proc.kill()

    assert spark.read.parquet(out).count() > 0
