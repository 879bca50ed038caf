"""Live Graylog sink clients (SURVEY.md S1-S3) for deployments that emit to
a real endpoint instead of (or in addition to) the per-sink tables.

Reference behaviors, re-expressed for a distributed engine:

* UDP (graylog_client_udp.py:24-34): fire-and-forget datagrams.  The
  reference opens a NEW socket per message; here one socket per partition
  (executor task), messages batched through it.
* TCP (graylog_client_tcp.py:31-46): persistent connection,
  NUL-terminated frames.  The reference sends the payload twice when
  NUL-terminating (``:44-45`` sends ``data`` then ``data + NUL`` -- bug);
  this client sends one frame, with ``compat_double_send=True`` available
  to reproduce the reference byte stream exactly.
* HTTP (graylog_client_http.py:35-75): POST to ``/gelf`` with retries.
  The reference constructs timeouts it never assigns (``:28-33`` -- bug);
  here timeouts are real.

Usage from Spark -- per-partition, never per-row::

    routed.foreachPartition(make_partition_sender(SinkConfig(...)))

Each task opens its sinks once, streams its partition through the failover
chain (udp -> tcp -> http, ascii-gated like mariadb-log-consumer.py:565-591),
and closes.  At 1000 executors this is 1000 concurrent senders -- shard
Graylog inputs accordingly or route through the table sinks instead.
"""

from __future__ import annotations

import socket
import urllib.request
from dataclasses import dataclass
from typing import Iterable, Iterator


@dataclass(frozen=True)
class SinkConfig:
    host: str = "127.0.0.1"
    udp_port: int | None = 12201
    tcp_port: int | None = None
    http_port: int | None = None
    tcp_timeout: float = 2.0  # --graylog-tcp-timeout default (:256-261)
    http_timeout: float = 10.0  # --graylog-http-timeout default (:263-274)
    http_max_retries: int = 0  # --graylog-http-max-retries default (:275-280)
    compat_double_send: bool = False  # reproduce the TCP double-send bug


class UdpClient:
    def __init__(self, cfg: SinkConfig):
        self._addr = (cfg.host, cfg.udp_port)
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def send(self, payload: bytes) -> None:
        self._sock.sendto(payload, self._addr)

    def close(self) -> None:
        self._sock.close()


class TcpClient:
    def __init__(self, cfg: SinkConfig):
        self._cfg = cfg
        self._sock = socket.create_connection(
            (cfg.host, cfg.tcp_port), timeout=cfg.tcp_timeout
        )

    def send(self, payload: bytes) -> None:
        if self._cfg.compat_double_send:
            # graylog_client_tcp.py:44-45 sends the un-terminated payload
            # and then the NUL-terminated one
            self._sock.sendall(payload)
        self._sock.sendall(payload + b"\x00")

    def close(self) -> None:
        self._sock.close()


class HttpClient:
    def __init__(self, cfg: SinkConfig):
        self._cfg = cfg
        self._url = f"http://{cfg.host}:{cfg.http_port}/gelf"

    def send(self, payload: str) -> None:
        attempts = self._cfg.http_max_retries + 1
        last: Exception | None = None
        for _ in range(attempts):
            try:
                req = urllib.request.Request(
                    self._url,
                    data=payload.encode("utf-8"),
                    headers={"Content-Type": "application/json"},
                    method="POST",
                )
                with urllib.request.urlopen(req, timeout=self._cfg.http_timeout):
                    return
            except Exception as e:  # noqa: BLE001 -- retry loop
                last = e
        if last is not None:
            raise last

    def close(self) -> None:
        pass


def send_with_failover(
    messages: Iterable[str], cfg: SinkConfig
) -> dict[str, int]:
    """The reference's failover chain (mariadb-log-consumer.py:565-591) over
    an iterator of serialized GELF strings.  Returns per-sink send counts.
    US-ASCII encodability gates udp/tcp exactly like ``bytearray(msg,
    'us-ascii')`` (:567-583); any sink error falls through to the next."""
    counts = {"udp": 0, "tcp": 0, "http": 0, "dropped": 0}
    udp = UdpClient(cfg) if cfg.udp_port else None
    tcp = None
    http = HttpClient(cfg) if cfg.http_port else None
    try:
        for msg in messages:
            sent = False
            payload: bytes | None = None
            try:
                payload = msg.encode("us-ascii")
            except UnicodeEncodeError:
                payload = None
            if udp is not None and payload is not None:
                try:
                    udp.send(payload)
                    counts["udp"] += 1
                    sent = True
                except Exception:  # noqa: BLE001 -- failover (:571-575)
                    pass
            if not sent and cfg.tcp_port and payload is not None:
                try:
                    if tcp is None:
                        tcp = TcpClient(cfg)
                    tcp.send(payload)
                    counts["tcp"] += 1
                    sent = True
                except Exception:  # noqa: BLE001
                    if tcp is not None:  # close the dead socket, don't leak it
                        try:
                            tcp.close()
                        except Exception:  # noqa: BLE001
                            pass
                        tcp = None
            if not sent and http is not None:
                try:
                    http.send(msg)
                    counts["http"] += 1
                    sent = True
                except Exception:  # noqa: BLE001
                    pass
            if not sent:
                counts["dropped"] += 1
    finally:
        if udp:
            udp.close()
        if tcp:
            tcp.close()
    return counts


def make_partition_sender(cfg: SinkConfig, gelf_col: str = "gelf_json"):
    """foreachPartition callback: one client set per task, batched sends."""

    def _send(rows: Iterator) -> None:
        send_with_failover((getattr(r, gelf_col) for r in rows), cfg)

    return _send
