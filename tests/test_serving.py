"""Serving veneer: CLI console + HTTP endpoints (REST 404-on-empty,
NDJSON; GraphQL-shape POST /query), mirroring the reference's frontend
tests (query/query_rest_test.go:124-174, query_graphql_test.go:77-146):
seed 3 observations, assert rrname hit, rdata hit (2 rows), miss.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest

from balboa_spark.operators.aggregate import aggregate
from balboa_spark.plans.layout import ObservationStore

from .test_layout_streaming import seed_obs


@pytest.fixture()
def store(spark, tmp_path):
    s = ObservationStore(spark, str(tmp_path / "store"), num_buckets=4)
    s.write(aggregate(seed_obs(spark)))
    return s


@pytest.fixture()
def server(store):
    from balboa_spark.serving import serve_http

    srv = serve_http(store, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_rest_endpoint(server):
    # rdata hit: 1.2.3.4 -> foo + baz (2 NDJSON lines)
    code, body = _get(f"{server}/pdns/query/1.2.3.4")
    assert code == 200
    objs = [json.loads(l) for l in body.strip().split("\n")]
    assert sorted(o["rrname"] for o in objs) == ["baz", "foo"]
    assert all(
        set(o) == {"count", "time_first", "time_last", "rrtype", "rrname", "rdata", "sensor_id"}
        for o in objs
    )
    assert all(isinstance(o["time_first"], int) for o in objs)

    # rrname hit
    code, body = _get(f"{server}/pdns/query/foo")
    assert code == 200
    assert json.loads(body.strip())["rdata"] == "1.2.3.4"

    # miss -> 404 (query_rest.go:71-74); bad path -> 404 (:42-45)
    assert _get(f"{server}/pdns/query/nonexistent")[0] == 404
    assert _get(f"{server}/bad/path")[0] == 404

    # limit is per search
    code, body = _get(f"{server}/pdns/query/1.2.3.4?limit=1")
    assert code == 200 and len(body.strip().split("\n")) == 1


def test_graphql_shape_endpoint(server):
    def post(payload):
        req = urllib.request.Request(
            f"{server}/query",
            json.dumps(payload).encode(),
            {"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read() or b"{}")

    code, body = post({"rdata": "1.2.3.4"})
    assert code == 200
    assert sorted(e["rrname"] for e in body["data"]["entries"]) == ["baz", "foo"]

    code, body = post({"rrname": "foo", "rrtype": "A"})
    assert code == 200 and len(body["data"]["entries"]) == 1
    # GraphQL Entry carries RFC3339 time variants alongside unix
    # seconds (query_graphql.go:95-108); plain REST (above) does not
    (entry,) = body["data"]["entries"]
    assert entry["time_first_rfc3339"].endswith("Z") and "T" in entry["time_first_rfc3339"]
    assert entry["time_last_rfc3339"].endswith("Z")

    # neither rdata nor rrname -> validation error (query_graphql.go:242-246)
    code, body = post({"rrtype": "A"})
    assert code == 400 and body["errors"]

    # rrtype outside the 46-value RRType enum (query_graphql.go:26-73)
    # -> the GraphQL-parser-shaped rejection, before any query runs
    code, body = post({"rrname": "foo", "rrtype": "BOGUS"})
    assert code == 400 and 'Expected type "RRType"' in body["errors"][0]
    # wrong in BOTH ways (bad enum AND no rdata/rrname): the enum
    # error wins — the reference's parser rejects before the resolver's
    # own validation ever runs
    code, body = post({"rrtype": "BOGUS"})
    assert code == 400 and 'Expected type "RRType"' in body["errors"][0]
    # enum values beyond the seeded A records still validate
    code, body = post({"rrname": "foo", "rrtype": "TLSA"})
    assert code == 200 and body["data"]["entries"] == []

    # aliases field (query_graphql.go:380-398): same rdata+sensor,
    # different rrname — foo's alias is baz and vice versa
    code, body = post({"rrname": "foo", "aliases": True})
    assert code == 200
    (entry,) = body["data"]["entries"]
    assert [a["rrname"] for a in entry["aliases"]] == ["baz"]


def test_stats_endpoint(server):
    # the GraphQL stats() query (query_graphql.go:299-311)
    code, body = _get(f"{server}/stats")
    assert code == 200
    stats = json.loads(body)["data"]["stats"]
    assert stats["total_count"] == 3
    assert stats["num_goroutines"] >= 1


def test_cli_console(spark, store, tmp_path, capsys):
    from balboa_spark.cli import build_parser, run

    def cli(*argv):
        return run(build_parser().parse_args(argv), spark=spark)

    out = str(tmp_path / "dump")
    assert cli("dump", store.path, out) == 0
    assert spark.read.parquet(out).count() == 3

    nd = str(tmp_path / "nd")
    assert cli("jsonize", store.path, nd) == 0

    assert cli("replay", store.path, out) == 0  # counts double (documented)
    assert cli("query", store.path, "--rrname", "foo") == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().split("\n")]
    assert lines[0]["count"] == 20  # 10 + replayed 10
    assert cli("query", store.path, "--rrname", "nope") == 1  # 404 analog

    # CIDR range query (cmd/balboa/cmds/query.go): 1.2.3.4/.5 are inside
    # 1.2.3.0/24 (network/broadcast excluded — neither row is .0/.255)
    assert cli("query", store.path, "--cidr", "1.2.3.0/24") == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().split("\n")]
    assert sorted(r["rrname"] for r in rows) == ["bar", "baz", "foo"]
    assert cli("query", store.path, "--cidr", "9.9.9.0/24") == 1

    # residual filters must bind BEFORE the limit (ADVICE r2): foo is
    # the LAST row in canonical order (bar < baz < foo), so filtering
    # after a limit=1 range scan would return bar, drop it on the
    # rrname residual, and report empty — the fixed path finds foo
    assert (
        cli("query", store.path, "--cidr", "1.2.3.0/24", "--rrname", "foo", "--limit", "1")
        == 0
    )
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().split("\n")]
    assert [r["rrname"] for r in rows] == ["foo"]

    bak = str(tmp_path / "bak")
    assert cli("backup", store.path, bak) == 0
    restored = ObservationStore(spark, bak)
    assert restored.forward().count() == 3


# -- GraphQL parse layer ------------------------------------------------------

def test_graphql_parser_units():
    """Parser-level behavior, no store needed: document shapes, value
    types, variables with defaults, and the rejection set."""
    from balboa_spark.graphql import GraphQLError, parse

    op = parse(
        '''
        # leading comment
        query Lookup($t: RRType = A, $n: Int) {
          entries(rrname: "foo", rrtype: $t, limit: $n) {
            rrname rdata count
            aliases(limit: 5) { rrname }
          }
          stats { total_count }
        }
        '''
    )
    assert op["variables"]["t"]["type"] == "RRType"
    assert str(op["variables"]["t"]["default"]) == "A"
    entries, stats = op["selections"]
    assert entries["name"] == "entries" and entries["args"]["rrname"] == "foo"
    assert [f["name"] for f in entries["selections"]] == [
        "rrname", "rdata", "count", "aliases",
    ]
    assert entries["selections"][3]["args"] == {"limit": 5}
    assert stats["selections"][0]["name"] == "total_count"

    # shorthand (no 'query' keyword) parses too
    assert parse("{ stats { num_goroutines } }")["selections"][0]["name"] == "stats"

    for bad in (
        "mutation { announceObservation }",  # schema has no mutations
        "{ entries(rrname: ) { rrname } }",
        "query { entries { rrname } } query { stats { total_count } }",
        "{ ...frag }",
    ):
        with pytest.raises(GraphQLError):
            parse(bad)


def test_graphql_endpoint_end_to_end(server):
    """POST /graphql: real GraphQL documents against the seeded store —
    field projection, enum validation (name vs string), variables,
    nested aliases, stats, and resolver-level errors."""
    def gql(query, variables=None):
        req = urllib.request.Request(
            f"{server}/graphql",
            json.dumps({"query": query, "variables": variables or {}}).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            return json.loads(r.read())

    # field projection: only requested fields come back
    body = gql('{ entries(rrname: "foo") { rrname count time_first_rfc3339 } }')
    (e,) = body["data"]["entries"]
    assert set(e) == {"rrname", "count", "time_first_rfc3339"}
    assert e["rrname"] == "foo" and e["count"] == 10
    assert e["time_first_rfc3339"] == "2020-01-01T00:00:00Z"

    # enum as bare name works; rrtype filter applies
    body = gql('{ entries(rrname: "foo", rrtype: A) { rrname } }')
    assert len(body["data"]["entries"]) == 1
    # enum as STRING is a type error, as is an unknown name
    for q in (
        '{ entries(rrname: "foo", rrtype: "A") { rrname } }',
        '{ entries(rrname: "foo", rrtype: BOGUS) { rrname } }',
    ):
        body = gql(q)
        assert 'Expected type "RRType"' in body["errors"][0]["message"]

    # variables: JSON string re-typed to the enum via the declaration
    body = gql(
        'query($t: RRType) { entries(rrname: "foo", rrtype: $t) { rdata } }',
        {"t": "A"},
    )
    assert body["data"]["entries"] == [{"rdata": "1.2.3.4"}]

    # nested aliases: foo(1.2.3.4) aliases to baz on the same sensor
    body = gql('{ entries(rrname: "foo") { rrname aliases(limit: 10) { rrname count } } }')
    (e,) = body["data"]["entries"]
    assert [a["rrname"] for a in e["aliases"]] == ["baz"]
    assert set(e["aliases"][0]) == {"rrname", "count"}

    # LeafEntry shares Entry's leaf resolvers: rfc3339 variants are
    # legal on the nested aliases selection too (formerly a KeyError
    # that escaped execute() and crashed the handler with no response)
    body = gql(
        '{ entries(rrname: "foo") { rrname'
        " aliases { rrname time_first_rfc3339 time_last_rfc3339 } } }"
    )
    (e,) = body["data"]["entries"]
    (a,) = e["aliases"]
    assert a["time_first_rfc3339"].endswith("Z") and "T" in a["time_first_rfc3339"]
    assert a["time_last_rfc3339"].endswith("Z")

    # resolver validation: neither rdata nor rrname
    body = gql("{ entries(limit: 5) { rrname } }")
    assert body["errors"][0]["message"]

    # unknown field on Entry
    body = gql('{ entries(rrname: "foo") { bogus } }')
    assert "Cannot query field" in body["errors"][0]["message"]

    # stats
    body = gql("{ stats { total_count num_goroutines } }")
    assert body["data"]["stats"]["total_count"] == 3
    assert body["data"]["stats"]["num_goroutines"] >= 1
