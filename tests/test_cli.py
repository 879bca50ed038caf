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


def test_reference_compat_surface():
    """Drop-in flags from the reference CLI: --log alias, case-insensitive
    values, --stop LIMIT cross-validation, --force-run no-op, both-or-
    neither graylog validation, label slash rule."""
    a = parse_args(
        ["--log", "/in", "--output", "/out", "--log-type", "error",
         "--stop", "limit", "--limit", "10", "--force-run",
         "--graylog-http-timeout-idle", "5"]
    )
    assert a.input == "/in" and a.log_type == "ERROR" and a.stop == "LIMIT"
    assert a.force_run

    with pytest.raises(SystemExit) as e:  # reference :313-314
        parse_args(["--input", "/in", "--output", "/out", "--stop", "LIMIT"])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:  # reference :319-320
        parse_args(["--input", "/in", "--output", "/out", "--label", "a/b"])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:  # ports without host (:322-323)
        parse_args(["--input", "/in", "--output", "/out", "--graylog-port-udp", "1"])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:
        parse_args(
            ["--input", "/in", "--output", "/out", "--graylog-host", "h",
             "--graylog-port-udp", "1", "--graylog-http-max-retries", "-1"]
        )
    assert e.value.code == 2


def test_graylog_args():
    a = parse_args(
        [
            "--input", "/in", "--output", "/out",
            "--graylog-host", "gl.example", "--graylog-port-udp", "12201",
            "--graylog-http-max-retries", "2", "--tcp-compat-double-send",
        ]
    )
    assert a.graylog_host == "gl.example" and a.graylog_port_udp == 12201
    assert a.graylog_http_max_retries == 2 and a.tcp_compat_double_send


def test_graylog_host_requires_a_port():
    with pytest.raises(SystemExit) as e:
        parse_args(["--input", "/in", "--output", "/out", "--graylog-host", "h"])
    assert e.value.code == 2


def test_stateful_assembly_validation():
    # needs streaming mode AND an explicit dialect (no cross-batch
    # auto-detection)
    with pytest.raises(SystemExit) as e:
        parse_args(["--input", "/in", "--output", "/out", "--stateful-assembly"])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:
        parse_args(
            ["--input", "/in", "--output", "/out", "--stateful-assembly",
             "--stop", "NEVER", "--checkpoint", "/c"]
        )
    assert e.value.code == 2
    a = parse_args(
        ["--input", "/in", "--output", "/out", "--stateful-assembly",
         "--stop", "NEVER", "--checkpoint", "/c", "--log-type", "ERROR"]
    )
    assert a.stateful_assembly and a.log_type == "ERROR"
    assert a.stateful_flush_ms is None  # default: 4x trigger, in the stream


def test_stateful_flush_ms_validation():
    base = ["--input", "/in", "--output", "/out"]
    stateful = base + ["--stateful-assembly", "--stop", "NEVER",
                       "--checkpoint", "/c", "--log-type", "ERROR"]
    with pytest.raises(SystemExit) as e:  # requires --stateful-assembly
        parse_args(base + ["--stateful-flush-ms", "5000"])
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:  # must be positive
        parse_args(stateful + ["--stateful-flush-ms", "0"])
    assert e.value.code == 2
    a = parse_args(stateful + ["--stateful-flush-ms", "5000"])
    assert a.stateful_flush_ms == 5000


def test_eventlog_validation():
    # ':' in path: the reference's separator rule (:306-307)
    with pytest.raises(SystemExit) as e:
        parse_args(
            ["--input", "/in", "--output", "/out", "--eventlog-file", "/tmp/a:b"]
        )
    assert e.value.code == 2
    with pytest.raises(SystemExit) as e:
        parse_args(["--input", "/in", "--output", "/out", "--truncate-eventlog"])
    assert e.value.code == 2
