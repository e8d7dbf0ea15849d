"""S1-S4: live transport terminators.

The reference's feeders are in-process goroutines pushing into a
channel (feeder/feeder_http.go, feeder_socket.go, feeder_nmsg_socket.go,
feeder_amqp.go). In the Spark engine the channel is a landing
directory consumed by a Structured Streaming file source — the
terminators here accept the same wire inputs and append files; the
streaming query picks them up on the next micro-batch. Backpressure is
the file source's maxFilesPerTrigger (T4); delivery is at-least-once
with the store's epoch gate making the fold exactly-once.

- ``HTTPFeeder`` (feeder_http.go:49-79): body per POST; sensor id from
  the ``X-Sensor-ID`` header VERBATIM (missing header -> empty string,
  exactly like Go's r.Header.Get); always responds 200. Bodies land in
  ``sensor--<hex id>/`` subdirectories; ingest_stream's
  ``sensor_from_path`` recovers the per-request id.
- ``SocketLineFeeder`` (feeder_socket.go:28-73): unix stream socket,
  line-scanned with a 32 MiB max line (:46-47), sensor ``[unknown]``
  (:57). One landing file per connection.
- ``NmsgUdpFeeder`` (feeder_nmsg_socket.go:28-72): UDP datagrams,
  each one NMSG container, written verbatim as one binary file; the
  SIE vendor-id==2 filter is applied by the container decoder
  (sources/nmsg.py). Sensor ``[unknown]`` (:69).
- ``AMQPFeeder`` (feeder_amqp.go:91-287): consumes a queue bound to
  fanout exchanges; per delivery, gzip-decompresses when a
  ``compressed`` header is present (decompress failure -> warn + skip
  WITHOUT ack, feeder_amqp.go:260-266), takes the sensor id from the
  ``sensor_id`` header (missing -> empty string, :276-279), lands the
  body, then acks (:284). Connection failures trigger reconnect every
  2 s forever (reconnectOnFailure, :60-88). The broker client is
  pluggable: pika is used when importable (not in this container);
  tests inject a fake channel implementing the same tiny protocol.
"""

from __future__ import annotations

import gzip
import io
import os
import socket
import socketserver
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from balboa_spark.sources.common import UNKNOWN_SENSOR

#: reference line-scanner buffer cap (feeder_socket.go:46-47)
MAX_LINE = 32 * 1024 * 1024


def sensor_dir(sensor: str) -> str:
    """Landing subdir for a sensor id: hex-encoded so the directory
    name survives URI encoding (Spark's input_file_name returns URIs —
    percent-encoding would be double-escaped)."""
    return f"sensor--{sensor.encode().hex()}"


def _land(path: str, data: bytes, suffix: str) -> str:
    """Atomically place one file into a landing dir (write tmp +
    rename, so the streaming source never sees a partial file)."""
    os.makedirs(path, exist_ok=True)
    name = f"{uuid.uuid4().hex}{suffix}"
    tmp = os.path.join(path, f".{name}.tmp")
    with open(tmp, "wb") as f:
        f.write(data)
    final = os.path.join(path, name)
    os.rename(tmp, final)
    return final


def gunzip_lines(body: bytes) -> bytes:
    """AMQP bodies are gzip-compressed (feeder_amqp.go:44-57)."""
    return gzip.GzipFile(fileobj=io.BytesIO(body)).read()


class HTTPFeeder:
    """S1: accepts POSTed payloads, one landing file per request."""

    def __init__(self, land_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.land_dir = land_dir
        feeder = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # noqa: D102
                pass

            def do_POST(self):  # noqa: N802
                sensor = self.headers.get("X-Sensor-ID", "")
                n = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(n)
                if self.headers.get("Content-Encoding") == "gzip":
                    body = gunzip_lines(body)
                _land(
                    os.path.join(feeder.land_dir, sensor_dir(sensor)),
                    body,
                    ".ndjson",
                )
                # the reference always answers 200 (feeder_http.go:60)
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

        self._srv = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> tuple[str, int]:
        return self._srv.server_address[:2]

    def run(self) -> None:
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._srv.shutdown()


class SocketLineFeeder:
    """S3: unix-socket line source; lines buffered per connection and
    landed as one file when the peer closes (the reference forwards
    line-by-line into the channel; a file is the micro-batch analog)."""

    def __init__(self, land_dir: str, socket_path: str):
        self.land_dir = land_dir
        self.socket_path = socket_path
        feeder = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                buf = bytearray()
                while True:
                    line = self.rfile.readline(MAX_LINE)
                    if not line:
                        break
                    buf += line
                if buf:
                    _land(
                        os.path.join(feeder.land_dir, sensor_dir(UNKNOWN_SENSOR)),
                        bytes(buf),
                        ".ndjson",
                    )

        if os.path.exists(socket_path):
            os.unlink(socket_path)
        self._srv = socketserver.ThreadingUnixStreamServer(socket_path, Handler)
        self._thread: threading.Thread | None = None

    def run(self) -> None:
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._srv.shutdown()
        if os.path.exists(self.socket_path):
            os.unlink(self.socket_path)


class NmsgUdpFeeder:
    """S4: NMSG UDP datagram source; each datagram (one NMSG container)
    lands verbatim as one binary file. The SIE vendor filter runs in
    the decoder, as in the reference's Recv loop."""

    def __init__(self, land_dir: str, host: str = "127.0.0.1", port: int = 0, mtu: int = 1480):
        self.land_dir = land_dir
        self.mtu = mtu
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind((host, port))
        self._sock.settimeout(0.5)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> tuple[str, int]:
        return self._sock.getsockname()

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                # MTU-sized receive buffer, like the reference's Recv
                # loop (feeder_nmsg_socket.go:46-72): a datagram larger
                # than the advertised MTU is truncated there too
                data, _addr = self._sock.recvfrom(self.mtu)
            except socket.timeout:
                continue
            except OSError:
                break
            if data:
                _land(self.land_dir, data, ".nmsg")

    def run(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
        self._sock.close()


class AMQPFeeder:
    """S2: AMQP queue consumer landing message bodies for the streaming
    ingest (feeder_amqp.go:91-287 re-expressed over the landing-dir
    channel).

    ``connector`` is any zero-arg callable returning a CHANNEL: an
    object whose ``consume()`` yields deliveries carrying ``body``
    (bytes), ``headers`` (dict) and ``ack()``. The default connector
    builds one from pika when that library is importable; in
    environments without a broker client, pass a connector (tests use
    an in-memory fake) or run an external shovel into the landing dir.

    Per delivery, mirroring the reference's handle() loop:
    - ``compressed`` header present -> gunzip; failure warns and SKIPS
      without acking (feeder_amqp.go:260-266), so the broker redelivers
      to a consumer that may be able to parse it.
    - sensor id = ``sensor_id`` header, else "" (:276-279) — the same
      verbatim rule as HTTP's X-Sensor-ID.
    - land, then ack (:284): at-least-once into the landing dir; the
      store's epoch gate makes the downstream fold exactly-once (T5).

    A connector/consume error tears the channel down and reconnects
    after ``reconnect_delay`` seconds, forever, until ``stop()`` —
    the reconnectOnFailure loop (:60-88, amqpReconnDelay=2s).
    """

    RECONNECT_DELAY = 2.0

    def __init__(
        self,
        land_dir: str,
        connector=None,
        url: str = "amqp://localhost",
        exchanges: tuple[str, ...] = ("tdh.fever",),
        queue: str = "balboa",
        reconnect_delay: float | None = None,
    ):
        self.land_dir = land_dir
        self.url = url
        self.exchanges = exchanges
        self.queue = queue
        self.reconnect_delay = (
            self.RECONNECT_DELAY if reconnect_delay is None else reconnect_delay
        )
        self._connector = connector or self._pika_connector
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _pika_connector(self):
        try:
            import pika  # noqa: PLC0415 - optional broker client
        except ImportError as e:
            raise RuntimeError(
                "AMQPFeeder needs a broker client: pass connector= or "
                "install pika (not available in this environment); an "
                "external AMQP shovel into the landing dir is equivalent"
            ) from e

        conn = pika.BlockingConnection(pika.URLParameters(self.url))
        ch = conn.channel()
        for ex in self.exchanges:
            ch.exchange_declare(exchange=ex, exchange_type="fanout", durable=True)
        # reference queue name/args: feeder_amqp.go:155-167
        qname = ".".join([*self.exchanges, self.queue])
        ch.queue_declare(
            queue=qname,
            durable=False,
            auto_delete=True,
            exclusive=True,
            arguments={"x-message-ttl": 300000, "x-max-length-bytes": 100 * 1024 * 1024},
        )
        for ex in self.exchanges:
            ch.queue_bind(queue=qname, exchange=ex)

        class _PikaChannel:
            def consume(self_inner):
                for method, props, body in ch.consume(qname, auto_ack=False):
                    headers = (props.headers or {}) if props else {}

                    class _D:
                        def __init__(d):
                            d.body, d.headers = body, headers

                        def ack(d):
                            ch.basic_ack(method.delivery_tag)

                    yield _D()

            def close(self_inner):
                conn.close()

        return _PikaChannel()

    def _handle(self, delivery) -> None:
        body = delivery.body
        if "compressed" in delivery.headers:
            try:
                body = gunzip_lines(body)
            except Exception:
                return  # warn-and-skip, no ack (feeder_amqp.go:260-266)
        sensor = delivery.headers.get("sensor_id", "")
        _land(
            os.path.join(self.land_dir, sensor_dir(sensor)), body, ".ndjson"
        )
        delivery.ack()

    def _loop(self) -> None:
        while not self._stop.is_set():
            channel = None
            try:
                channel = self._connector()
                for delivery in channel.consume():
                    if self._stop.is_set():
                        break
                    self._handle(delivery)
            except Exception:
                pass  # fall through to reconnect, like reconnectOnFailure
            finally:
                if channel is not None and hasattr(channel, "close"):
                    try:
                        channel.close()
                    except Exception:
                        pass
            if not self._stop.is_set():
                self._stop.wait(self.reconnect_delay)

    def run(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
