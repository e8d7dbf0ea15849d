"""Serving veneer: CIRCL-REST + GraphQL-shape query endpoints over an
ObservationStore, plus the wire-format projection helpers.

Reference endpoints:
- ``GET /pdns/query/<subject>`` (query/query_rest.go:27-82): subject
  searched as rrname AND as rdata (per-search limit, concatenated),
  404 on empty, NDJSON — one observation object per line with
  ``time_first``/``time_last`` unix seconds
  (observation/observation.go:26-37).
- ``POST /query`` with ``{rdata?, rrname?, rrtype?, sensor_id?,
  limit?}``: the GraphQL resolver's argument surface
  (query/query_graphql.go:233-247) without the GraphQL parse layer
  (no graphql runtime in this engine — the resolver IS 4 nullable
  equality predicates + a limit, which this endpoint exposes
  directly). Response: ``{"data": {"entries": [...]}}``.

The HTTP layer is stdlib http.server — a thin veneer; all query
semantics live in operators/query.py.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from balboa_spark.operators.query import DEFAULT_LIMIT, Query, rest_search
from balboa_spark.plans.layout import ObservationStore

#: The GraphQL schema's RRType enum (query/query_graphql.go:26-73,
#: all 46 values verbatim). The engine layer stores rrtype as an open
#: string — the enum is a SERVING-EDGE contract, enforced here exactly
#: where the reference's GraphQL parser enforces it.
RRTYPES = frozenset(
    """A A6 AAAA AFSDB ALIAS APL AXFR CAA CDNSKEY CDS CERT CNAME DHCID
    DLV DNAME DNSKEY DS HINFO HIP IPSECKEY IXFR KEY KX LOC MX NAPTR NS
    NSEC NSEC3 NSEC3PARAM OPENPGPKEY OPT PTR RRSIG RP SIG SOA SPF SRV
    SSHFP TA TKEY TLSA TSIG TXT URI""".split()
)


def to_cof(df: DataFrame) -> DataFrame:
    """Observation rows -> COF wire fields (time_first/time_last unix
    seconds, observation/observation.go:26-37)."""
    return df.select(
        "count",
        F.unix_timestamp("first_seen").alias("time_first"),
        F.unix_timestamp("last_seen").alias("time_last"),
        "rrtype",
        "rrname",
        "rdata",
        "sensor_id",
    )


def _rfc3339(col: str) -> Column:
    # convert_timezone(..., 'UTC') pins the rendered wall-clock to UTC
    # regardless of spark.sql.session.timeZone, so the literal 'Z' is
    # always truthful (get_spark pins UTC, but the store/session may
    # come from elsewhere).
    return F.date_format(
        F.expr(f"convert_timezone('UTC', timestamp_seconds({col}))"),
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
    )


def to_graphql_entry(df: DataFrame) -> DataFrame:
    """Observation rows -> the GraphQL Entry field set: COF fields PLUS
    the RFC3339 time variants (query_graphql.go:95-108, resolvers
    :358-371). The plain REST shape (to_cof) has no rfc3339 fields."""
    return to_cof(df).select(
        "*",
        _rfc3339("time_first").alias("time_first_rfc3339"),
        _rfc3339("time_last").alias("time_last_rfc3339"),
    )


def to_cof_aliases(df: DataFrame) -> DataFrame:
    """Alias-join rows -> the GraphQL LeafEntry field set, entry key
    preserved. Carries the RFC3339 variants too: LeafEntry shares
    Entry's leaf resolvers (query_graphql.go:95-108), so a nested
    aliases selection may legally ask for time_first_rfc3339."""
    return df.select(
        "e_rrname",
        "e_sensor_id",
        "e_rdata",
        "count",
        F.unix_timestamp("first_seen").alias("time_first"),
        F.unix_timestamp("last_seen").alias("time_last"),
        "rrtype",
        "rrname",
        "rdata",
        "sensor_id",
    ).select(
        "*",
        _rfc3339("time_first").alias("time_first_rfc3339"),
        _rfc3339("time_last").alias("time_last_rfc3339"),
    )


def rest_query_store(store: ObservationStore, subject: str, limit: int = DEFAULT_LIMIT):
    """The REST handler's search core: subject as rrname against the
    forward layout, as rdata against the inverted layout (each its own
    bucket-pruned point lookup), concatenated with duplicates."""
    r = store.query(Query(rrname=subject, limit=limit))
    d = store.query(Query(rdata=subject, limit=limit))
    return to_cof(r.unionAll(d))


def ndjson_rows(df: DataFrame) -> list[str]:
    return [json.dumps(r.asDict(), separators=(",", ":")) for r in df.collect()]


def make_handler(store: ObservationStore, stats=None):
    """Build the request-handler class bound to one store. ``stats``
    is an optional EngineStatsListener whose query counter is ticked
    per answered lookup (the reference's q counter,
    backend/lib/engine.c:480-514)."""

    class Handler(BaseHTTPRequestHandler):
        # quiet by default; tests/daemons can override
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _write(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        _count_cache: dict[int, int] = {}

        def do_GET(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path == "/stats":
                # the GraphQL stats() query (query_graphql.go:299-311):
                # total_count + the parallelism analog of num_goroutines.
                # The count job runs once per store GENERATION (the
                # reference's total_count is an O(1) counter; here the
                # generation id makes the cached count exact — a merge
                # flips the manifest, invalidating the cache key).
                man = store._manifest() or {}
                gen = man.get("generation", -1)
                cache = Handler._count_cache
                if gen not in cache:
                    cache.clear()
                    cache[gen] = store.forward().count()
                payload = {
                    "total_count": cache[gen],
                    "num_goroutines": store.spark.sparkContext.defaultParallelism,
                }
                if stats is not None:
                    payload["counters"] = stats.counters.snapshot()
                body = json.dumps({"data": {"stats": payload}}).encode()
                self._write(200, body, "application/json")
                return
            prefix = "/pdns/query/"
            if not url.path.startswith(prefix):
                self._write(404, b"", "text/plain")
                return
            subject = unquote(url.path[len(prefix):])
            limit = DEFAULT_LIMIT
            qs = parse_qs(url.query)
            if "limit" in qs:
                try:
                    limit = int(qs["limit"][0])
                except ValueError:
                    pass
                if limit < 0:
                    limit = DEFAULT_LIMIT  # ignore nonsense, like bad parses
            if stats is not None:
                stats.count_query()
            lines = ndjson_rows(rest_query_store(store, subject, limit))
            if not lines:
                # 404-on-empty (query_rest.go:71-74)
                self._write(404, b"", "text/plain")
                return
            body = ("\n".join(lines) + "\n").encode()
            self._write(200, body, "application/x-ndjson")

        def do_POST(self):  # noqa: N802
            path = urlparse(self.path).path
            if path == "/graphql":
                # the real GraphQL parse layer (graphql.py): body is the
                # standard {"query": "...", "variables": {...}} envelope;
                # responses are always 200 with data/errors in the body,
                # like the reference's relay handler
                from balboa_spark.graphql import execute

                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    resp = execute(
                        store, req.get("query", ""), req.get("variables"), stats=stats
                    )
                except (ValueError, TypeError, json.JSONDecodeError) as ex:
                    resp = {"errors": [{"message": str(ex)}]}
                self._write(200, json.dumps(resp).encode(), "application/json")
                return
            if path != "/query":
                self._write(404, b"", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                args = json.loads(self.rfile.read(n) or b"{}")
                q = Query(
                    rdata=args.get("rdata"),
                    rrname=args.get("rrname"),
                    rrtype=args.get("rrtype"),
                    sensor_id=args.get("sensor_id"),
                    limit=int(args.get("limit", DEFAULT_LIMIT)),
                )
                # the GraphQL parser rejects values outside the RRType
                # enum BEFORE the resolver's own validation runs, so a
                # request that is wrong in both ways reports the enum
                # error first (query_graphql.go:26-73 parse precedes
                # :242-246 resolver checks)
                if q.rrtype is not None and q.rrtype not in RRTYPES:
                    raise ValueError(
                        f'Expected type "RRType", found {q.rrtype}.'
                    )
                q.validate()
                with_aliases = bool(args.get("aliases", False))
                alias_limit = int(args.get("alias_limit", DEFAULT_LIMIT))
            except (ValueError, TypeError, json.JSONDecodeError) as ex:
                # graphql-layer validation error (query_graphql.go:242-246);
                # TypeError covers null/typed-wrong limit args (int(None))
                body = json.dumps({"errors": [str(ex)]}).encode()
                self._write(400, body, "application/json")
                return
            if stats is not None:
                stats.count_query()
            result = store.query(q)
            rows = [r.asDict() for r in to_graphql_entry(result).collect()]
            if with_aliases:
                # the GraphQL 'aliases' field (query_graphql.go:380-398):
                # one join for the whole result set, not N+1 searches
                from balboa_spark.operators.query import aliases as aliases_op

                alias_rows = to_cof_aliases(
                    aliases_op(result, store.forward(), per_entry_limit=alias_limit)
                ).collect()
                by_entry: dict[tuple, list] = {}
                for a in alias_rows:
                    d = a.asDict()
                    key = (d.pop("e_rrname"), d.pop("e_sensor_id"), d.pop("e_rdata"))
                    by_entry.setdefault(key, []).append(d)
                for row in rows:
                    key = (row["rrname"], row["sensor_id"], row["rdata"])
                    row["aliases"] = by_entry.get(key, []) if row["rrtype"] in ("A", "AAAA") else None
            body = json.dumps({"data": {"entries": rows}}).encode()
            self._write(200, body, "application/json")

    return Handler


def serve_http(
    store: ObservationStore, host: str = "127.0.0.1", port: int = 8080, stats=None
):
    """Create (not start) the HTTP server; caller runs serve_forever()
    or spins it in a thread. port=0 picks an ephemeral port."""
    return ThreadingHTTPServer((host, port), make_handler(store, stats=stats))
