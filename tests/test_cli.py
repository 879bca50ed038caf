"""CLI surface tests (SURVEY.md C5): argument parsing + cross-validation,
no Spark session needed."""

from __future__ import annotations

import pytest

from jobs.run_pipeline import parse_args


def test_defaults():
    a = parse_args(["--input", "/in", "--output", "/out"])
    assert a.log_type == "AUTO" and a.stop == "EOF"
    assert a.mode == "strict" and a.serializer == "compat"
    assert not a.resume and a.offset == 0 and a.limit is None


def test_stop_never_requires_checkpoint():
    with pytest.raises(SystemExit) as e:
        parse_args(["--input", "/in", "--output", "/out", "--stop", "NEVER"])
    assert e.value.code == 2  # reference exit code for bad args


def test_sink_toggles_and_limits():
    a = parse_args(
        [
            "--input", "/in", "--output", "/out",
            "--no-udp", "--limit", "100", "--offset", "5",
            "--mode", "intended", "--serializer", "strict",
        ]
    )
    assert a.no_udp and not a.no_tcp
    assert a.limit == 100 and a.offset == 5
