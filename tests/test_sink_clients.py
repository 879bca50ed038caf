"""Live sink client tests (S1-S3) against in-process listeners -- the
reference's manual netcat check (README.md:115-132), automated."""

from __future__ import annotations

import socket
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from mariadb_to_graylog_spark.sinks.clients import SinkConfig, send_with_failover


def _udp_listener(results: list[bytes], ready: threading.Event, stop: threading.Event):
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(0.2)
    _udp_listener.port = sock.getsockname()[1]
    ready.set()
    while not stop.is_set():
        try:
            data, _ = sock.recvfrom(65536)
            results.append(data)
        except socket.timeout:
            continue
    sock.close()


def test_udp_send_and_ascii_failover_to_http():
    udp_got: list[bytes] = []
    http_got: list[bytes] = []

    ready, stop = threading.Event(), threading.Event()
    t = threading.Thread(target=_udp_listener, args=(udp_got, ready, stop), daemon=True)
    t.start()
    ready.wait(2)

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            http_got.append(self.rfile.read(int(self.headers["Content-Length"])))
            self.send_response(202)
            self.end_headers()

        def log_message(self, *a):  # silence
            pass

    httpd = HTTPServer(("127.0.0.1", 0), Handler)
    ht = threading.Thread(target=httpd.serve_forever, daemon=True)
    ht.start()

    cfg = SinkConfig(
        udp_port=_udp_listener.port,
        tcp_port=None,
        http_port=httpd.server_address[1],
    )
    msgs = ['{"version":"1.1","_text":"plain"}', '{"version":"1.1","_text":"café"}']
    counts = send_with_failover(msgs, cfg)

    stop.set()
    t.join(2)
    httpd.shutdown()

    # ascii message -> udp; non-ascii fails us-ascii encode -> http
    assert counts == {"udp": 1, "tcp": 0, "http": 1, "dropped": 0}
    assert udp_got == [msgs[0].encode("ascii")]
    assert http_got == [msgs[1].encode("utf-8")]


def test_tcp_framing_and_compat_double_send():
    got: list[bytes] = []
    ready = threading.Event()

    def server():
        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        server.port = srv.getsockname()[1]
        ready.set()
        conn, _ = srv.accept()
        conn.settimeout(1)
        try:
            while True:
                data = conn.recv(65536)
                if not data:
                    break
                got.append(data)
        except socket.timeout:
            pass
        conn.close()
        srv.close()

    t = threading.Thread(target=server, daemon=True)
    t.start()
    ready.wait(2)

    cfg = SinkConfig(udp_port=None, tcp_port=server.port, http_port=None)
    counts = send_with_failover(["abc"], cfg)
    t.join(2)
    assert counts["tcp"] == 1
    assert b"".join(got) == b"abc\x00"


def test_all_sinks_down_drops():
    cfg = SinkConfig(udp_port=None, tcp_port=1, http_port=1)  # closed ports
    counts = send_with_failover(["x"], cfg)
    assert counts["dropped"] == 1
