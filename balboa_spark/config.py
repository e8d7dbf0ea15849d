"""Config-driven wiring: feeders.yaml + selectors.yaml + backend.yaml
-> running ingest, exactly like ``balboa serve -f -s -b``
(cmd/balboa/cmds/serve.go:74-150).

Shapes mirror the reference's own config files:

- feeders.yaml (feeder/feeder_config.go:97-150): ``feeder:`` list of
  ``{name, type, input_format, ...transport options}``. The reference
  types (http, amqp, socket, nmsg_socket) are live transports; in the
  Spark engine every feeder is a Structured Streaming source over a
  landing directory (``path``) — the transport terminator (an HTTP
  gateway, an AMQP consumer, a socket relay) drops raw payload lines
  there. ``sensor_id`` per feeder plays the X-Sensor-ID header role
  (feeder_http.go:50).
- selectors.yaml (README.md:129-147): handled by
  streaming.selectors.load_selector_yaml.
- backend.yaml (README.md:158-175): top-level list of
  ``{name, host|path, tags?}``. Each backend becomes an
  ObservationStore; ``tags`` gate routing (db/db_remote.go:57-99),
  tag-less backends receive everything.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from balboa_spark.plans.layout import ObservationStore
from balboa_spark.streaming.ingest import ingest_stream
from balboa_spark.streaming.selectors import compile_selectors, load_selector_yaml

#: input_format values accepted by the reference's format switch
#: (feeder_config.go:123-147), all implemented in sources/registry.
KNOWN_FORMATS = {
    "fever_aggregate",
    "gopassivedns",
    "packetbeat",
    "suricata_dns",
    "gamelinux",
    "nmsg",
}

_FEEDER_TYPES = {"http", "amqp", "socket", "nmsg_socket", "file"}


@dataclass
class FeederSpec:
    name: str
    input_format: str
    path: str  # landing directory (the transport seam)
    type: str = "file"
    sensor_id: str | None = None
    max_files_per_trigger: int | None = None
    # transport options (reference feeders.yaml keys)
    listen_host: str = "127.0.0.1"
    listen_port: int = 0
    socket_path: str | None = None  # unix socket ('path' in the reference)
    bind_address: str | None = None  # nmsg_socket host:port
    mtu: int = 1480


@dataclass
class BackendSpec:
    name: str
    path: str  # store directory
    tags: Sequence[str] = field(default_factory=tuple)


def _slug(name: str) -> str:
    return re.sub(r"[^a-z0-9]+", "_", name.lower()).strip("_")


def load_feeders(cfg: dict, data_root: str | None = None) -> list[FeederSpec]:
    """feeders.yaml dict -> FeederSpecs. A feeder without an explicit
    ``path`` gets ``<data_root>/feeds/<slug(name)>``."""
    out = []
    for spec in cfg.get("feeder", ()):
        name = spec["name"]
        ftype = spec.get("type", "file")
        if ftype not in _FEEDER_TYPES:
            raise ValueError(f"feeder {name}: unknown type {ftype!r}")
        fmt = spec["input_format"]
        if fmt not in KNOWN_FORMATS:
            # the reference log.Fatals on unknown formats (feeder_config.go:146)
            raise ValueError(f"feeder {name}: unknown input format {fmt!r}")
        if ftype == "nmsg_socket" and fmt != "nmsg":
            # mirror the reference's misconfiguration warning (:86-92) as an error
            raise ValueError(f"feeder {name}: nmsg_socket feeders must use format 'nmsg'")
        path = spec.get("path")
        if path is None:
            if data_root is None:
                raise ValueError(f"feeder {name}: needs 'path' or a data_root")
            path = os.path.join(data_root, "feeds", _slug(name))
        out.append(
            FeederSpec(
                name=name,
                input_format=fmt,
                path=path,
                type=ftype,
                sensor_id=spec.get("sensor_id"),
                max_files_per_trigger=spec.get("max_files_per_trigger"),
                listen_host=spec.get("listen_host", "127.0.0.1"),
                listen_port=int(spec.get("listen_port", 0)),
                socket_path=spec.get("socket_path"),
                bind_address=spec.get("bind_address"),
                mtu=int(spec.get("mtu", 1480)),
            )
        )
    return out


def start_transport(f: FeederSpec):
    """Start the live terminator for a feeder spec (S1/S3/S4); returns
    the running feeder object (with .stop()) or None for plain file
    landing dirs and AMQP (external consumer shovels into the dir)."""
    from balboa_spark.streaming import transports

    if f.type == "http":
        t = transports.HTTPFeeder(f.path, f.listen_host, f.listen_port)
    elif f.type == "socket":
        if not f.socket_path:
            raise ValueError(f"feeder {f.name}: socket feeders need socket_path")
        t = transports.SocketLineFeeder(f.path, f.socket_path)
    elif f.type == "nmsg_socket":
        host, _, port = (f.bind_address or "127.0.0.1:0").rpartition(":")
        t = transports.NmsgUdpFeeder(f.path, host or "127.0.0.1", int(port), f.mtu)
    else:
        return None
    t.run()
    return t


def load_backends(cfg: list, data_root: str | None = None) -> list[BackendSpec]:
    """backend.yaml list -> BackendSpecs. ``path`` names the store
    directory; a reference-style ``host`` is mapped to
    ``<data_root>/stores/<slug(name)>`` (the TCP backend is replaced by
    a Parquet store)."""
    out = []
    for spec in cfg:
        name = spec["name"]
        path = spec.get("path")
        if path is None:
            if data_root is None:
                raise ValueError(f"backend {name}: needs 'path' or a data_root")
            path = os.path.join(data_root, "stores", _slug(name))
        out.append(BackendSpec(name=name, path=path, tags=tuple(spec.get("tags", ()))))
    return out


def serve(
    spark: SparkSession,
    feeders_cfg: dict,
    backends_cfg: list,
    selectors_cfg: dict | None = None,
    pattern_files: dict[str, Sequence[str]] | None = None,
    scripts: dict[str, Callable] | None = None,
    data_root: str | None = None,
    checkpoint_root: str | None = None,
    num_buckets: int = 8,
):
    """Wire feeders -> selector engine -> tag-routed stores and start
    one streaming query per feeder (serve.go:131-150 restated).

    Returns (queries, stores, transports): the StreamingQuery handles,
    the route-name -> ObservationStore map, and any started transport
    terminators (callers stop() them on shutdown).
    """
    feeders = load_feeders(feeders_cfg, data_root)
    backends = load_backends(backends_cfg, data_root)
    if not feeders:
        raise ValueError("no feeders configured")
    if not backends:
        raise ValueError("no backends configured")

    selector = None
    if selectors_cfg:
        rules = load_selector_yaml(selectors_cfg, pattern_files, scripts)
        if rules:
            selector = compile_selectors(rules)

    stores = {
        b.name: ObservationStore(spark, b.path, num_buckets=num_buckets)
        for b in backends
    }
    routes = {b.name: list(b.tags) for b in backends}

    queries, running = [], []
    for f in feeders:
        t = start_transport(f)
        if t is not None:
            running.append(t)
        ckpt = (
            os.path.join(checkpoint_root, _slug(f.name)) if checkpoint_root else None
        )
        # nmsg over a live socket arrives as binary containers
        fmt = "nmsg_wire" if (f.type == "nmsg_socket" and f.input_format == "nmsg") else f.input_format
        from balboa_spark.streaming.ingest import SENSOR_PATH_RE

        queries.append(
            ingest_stream(
                spark,
                f.path,
                fmt,
                stores=stores,
                routes=routes,
                selector=selector,
                sensor_id=f.sensor_id,
                checkpoint=ckpt,
                max_files_per_trigger=f.max_files_per_trigger,
                # transports attach per-request sensor ids via the
                # landing layout; static file feeders use sensor_id
                sensor_from_path=SENSOR_PATH_RE if f.type in ("http", "socket") else None,
                # each feeder is its own StreamingQuery: scope the
                # stores' epoch replay gate by feeder name so feeders
                # sharing a backend never gate each other
                stream_id=f.name,
            )
        )
    return queries, stores, running
