"""GraphQL parse + execute layer for the query surface.

The reference serves its query API through a real GraphQL schema
(query/query_graphql.go:25-187: ``entries(rdata, rrname, rrtype,
sensor_id, limit = 1000): [Entry]`` with a nested ``aliases(limit =
1000)`` field, and ``stats(): Stats``; the Mutation block is commented
out at :177-187). Previous rounds exposed the resolver ARGUMENT
surface as plain JSON; this module adds the missing parse layer: a
recursive-descent parser for the executable subset the schema needs
(operations, field arguments, variables with defaults, int/string/
boolean/null/enum/list values, field selection sets) and an executor
that resolves against an ObservationStore.

Deliberately NOT implemented (schema has no use for them, reject with
a clear error): fragments, directives, subscriptions, mutations.

Validation mirrors the reference's behavior:
- unknown rrtype enum value -> 'Expected type "RRType", found X.'
  (the graphql-go library rejects it before the resolver runs);
- enum values must be NAMES, not strings ("A" is a String literal,
  not an RRType — same rejection);
- neither rdata nor rrname -> the resolver's QueryError
  (query_graphql.go:302-306);
- response shape {"data": ...} / {"errors": [{"message": ...}]}.

Scale note: the parse/plan layer is driver-side by construction
(micro-seconds per request); execution delegates to the bucket-pruned
store plans — one Spark job per entries() call, one broadcast alias
join when requested, never per-row work in Python.
"""

from __future__ import annotations

import re
import uuid
from typing import Any

from balboa_spark.operators.query import DEFAULT_LIMIT, Query
from balboa_spark.serving import RRTYPES, to_cof_aliases, to_graphql_entry

# --- tokenizer -------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>[\s,]+|\#[^\n\r]*)
    | (?P<name>[_A-Za-z][_0-9A-Za-z]*)
    | (?P<float>-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+[eE][+-]?\d+)
    | (?P<int>-?\d+)
    | (?P<string>"(?:\\.|[^"\\])*")
    | (?P<punct>\$|\(|\)|\{|\}|\[|\]|:|=|!|\.\.\.)
    """,
    re.VERBOSE,
)


class GraphQLError(Exception):
    """Parse/validation/execution error carried to the response's
    ``errors`` list (message-only, like the reference's QueryError)."""


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise GraphQLError(f"Unexpected character {src[pos]!r}.")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


# --- parser ----------------------------------------------------------------

class _Parser:
    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, value: str | None = None) -> str:
        k, v = self.next()
        if k != kind or (value is not None and v != value):
            want = value or kind
            raise GraphQLError(f"Expected {want!r}, found {v or 'EOF'!r}.")
        return v

    def parse_document(self) -> dict:
        """One executable operation: optional 'query' keyword + name +
        variable definitions, then the selection set. (The schema has
        no mutations/subscriptions; multiple operations per document
        are out of scope and rejected.)"""
        k, v = self.peek()
        op = {"variables": {}, "selections": None}
        if k == "name":
            if v not in ("query",):
                if v in ("mutation", "subscription"):
                    raise GraphQLError(f"Unsupported operation type {v!r}.")
                raise GraphQLError(f"Expected 'query' or '{{', found {v!r}.")
            self.next()
            if self.peek()[0] == "name":  # operation name
                self.next()
            if self.peek() == ("punct", "("):
                op["variables"] = self.parse_variable_defs()
        op["selections"] = self.parse_selection_set()
        if self.peek()[0] != "eof":
            raise GraphQLError(
                f"Expected EOF, found {self.peek()[1]!r} (one operation per document)."
            )
        return op

    def parse_variable_defs(self) -> dict[str, dict]:
        self.expect("punct", "(")
        out = {}
        while self.peek() != ("punct", ")"):
            self.expect("punct", "$")
            name = self.expect("name")
            self.expect("punct", ":")
            typ = self.expect("name")
            if self.peek() == ("punct", "!"):
                self.next()
            default = None
            if self.peek() == ("punct", "="):
                self.next()
                default = self.parse_value(variables=None)
            out[name] = {"type": typ, "default": default}
        self.next()
        return out

    def parse_selection_set(self) -> list[dict]:
        self.expect("punct", "{")
        out = []
        while self.peek() != ("punct", "}"):
            k, v = self.peek()
            if (k, v) == ("punct", "..."):
                raise GraphQLError("Fragments are not supported by this schema.")
            name = self.expect("name")
            field = {"name": name, "args": {}, "selections": None}
            if self.peek() == ("punct", "("):
                field["args"] = self.parse_arguments()
            if self.peek() == ("punct", "{"):
                field["selections"] = self.parse_selection_set()
            out.append(field)
        self.next()
        return out

    def parse_arguments(self) -> dict[str, Any]:
        self.expect("punct", "(")
        out = {}
        while self.peek() != ("punct", ")"):
            name = self.expect("name")
            self.expect("punct", ":")
            out[name] = self.parse_value(variables="defer")
        self.next()
        return out

    def parse_value(self, variables) -> Any:
        k, v = self.next()
        if k == "int":
            return int(v)
        if k == "float":
            return float(v)
        if k == "string":
            body = v[1:-1]
            return re.sub(
                r"\\(.)",
                lambda m: {"n": "\n", "t": "\t", "r": "\r"}.get(m.group(1), m.group(1)),
                body,
            )
        if k == "name":
            if v == "true":
                return True
            if v == "false":
                return False
            if v == "null":
                return None
            return _Enum(v)
        if (k, v) == ("punct", "$"):
            if variables is None:
                raise GraphQLError("Variables are not allowed in defaults.")
            return _Var(self.expect("name"))
        if (k, v) == ("punct", "["):
            out = []
            while self.peek() != ("punct", "]"):
                out.append(self.parse_value(variables))
            self.next()
            return out
        raise GraphQLError(f"Unexpected value token {v!r}.")


class _Enum(str):
    """A bare-name value (GraphQL enum literal) — distinct from a
    String literal so RRType validation can tell '\"A\"' from 'A'."""


class _Var:
    def __init__(self, name: str):
        self.name = name


def parse(src: str) -> dict:
    return _Parser(src).parse_document()


# --- execution -------------------------------------------------------------

ENTRY_FIELDS = frozenset(
    """id count rrname rrtype rdata time_first time_first_rfc3339
    time_last time_last_rfc3339 sensor_id aliases""".split()
)
LEAF_FIELDS = ENTRY_FIELDS - {"aliases", "id"}


def _resolve_args(args: dict, variables: dict, var_defs: dict) -> dict:
    out = {}
    for name, val in args.items():
        if isinstance(val, _Var):
            d = var_defs.get(val.name)
            if d is None:
                raise GraphQLError(f"Variable ${val.name} is not defined.")
            if val.name in variables:
                v = variables[val.name]
                # a JSON variable for an enum position arrives as a
                # plain string; the type annotation re-types it
                val = _Enum(v) if d["type"] == "RRType" and isinstance(v, str) else v
            else:
                val = d["default"]
        out[name] = val
    return out


def _validate_rrtype(val: Any) -> str | None:
    if val is None:
        return None
    if not isinstance(val, _Enum) or str(val) not in RRTYPES:
        shown = f'"{val}"' if isinstance(val, str) and not isinstance(val, _Enum) else val
        raise GraphQLError(f'Expected type "RRType", found {shown}.')
    return str(val)


def _check_fields(selections: list[dict], allowed: frozenset, typename: str) -> None:
    for f in selections:
        if f["name"] not in allowed:
            raise GraphQLError(
                f"Cannot query field {f['name']!r} on type {typename!r}."
            )


def execute(store, src: str, variables: dict | None = None, stats=None) -> dict:
    """Parse + execute one GraphQL request against a store; returns the
    response dict ({"data": ...} or {"errors": [{"message": ...}]}).
    ``stats`` is the optional EngineStatsListener (query counter)."""
    variables = variables or {}
    try:
        op = parse(src)
        data: dict[str, Any] = {}
        for field in op["selections"]:
            if field["name"] == "entries":
                data["entries"] = _exec_entries(store, field, variables, op["variables"], stats)
            elif field["name"] == "stats":
                data["stats"] = _exec_stats(store, field, stats)
            else:
                raise GraphQLError(
                    f"Cannot query field {field['name']!r} on type 'Query'."
                )
        return {"data": data}
    except GraphQLError as ex:
        return {"errors": [{"message": str(ex)}]}
    except Exception as ex:  # noqa: BLE001 — a resolver bug must still
        # produce a well-formed GraphQL error envelope, never a crashed
        # handler with no response written (the Go server's panic
        # recovery gives the same guarantee).
        return {"errors": [{"message": f"internal error: {ex}"}]}


def _exec_entries(store, field, variables, var_defs, stats) -> list[dict]:
    args = _resolve_args(field["args"], variables, var_defs)
    unknown = set(args) - {"rdata", "rrname", "rrtype", "sensor_id", "limit"}
    if unknown:
        raise GraphQLError(
            f"Unknown argument {sorted(unknown)[0]!r} on field 'entries'."
        )
    rrtype = _validate_rrtype(args.get("rrtype"))
    # a declared-but-unbound variable resolves to null -> schema default
    limit = args.get("limit")
    q = Query(
        rdata=args.get("rdata"),
        rrname=args.get("rrname"),
        rrtype=rrtype,
        sensor_id=args.get("sensor_id"),
        limit=DEFAULT_LIMIT if limit is None else int(limit),
    )
    try:
        q.validate()
    except ValueError as ex:
        raise GraphQLError(str(ex)) from None
    sels = field["selections"]
    if not sels:
        raise GraphQLError("Field 'entries' of type '[Entry]' must have a selection.")
    _check_fields(sels, ENTRY_FIELDS, "Entry")
    if stats is not None:
        stats.count_query()

    result = store.query(q)
    rows = [r.asDict() for r in to_graphql_entry(result).collect()]
    alias_field = next((f for f in sels if f["name"] == "aliases"), None)
    by_entry: dict[tuple, list] = {}
    if alias_field is not None:
        if not alias_field["selections"]:
            raise GraphQLError(
                "Field 'aliases' of type '[LeafEntry]' must have a selection."
            )
        _check_fields(alias_field["selections"], LEAF_FIELDS, "LeafEntry")
        a_args = _resolve_args(alias_field["args"], variables, var_defs)
        a_limit = a_args.get("limit")  # schema default 1000 (:108)
        a_limit = DEFAULT_LIMIT if a_limit is None else int(a_limit)
        from balboa_spark.operators.query import aliases as aliases_op

        alias_rows = to_cof_aliases(
            aliases_op(result, store.forward(), per_entry_limit=a_limit)
        ).collect()
        for a in alias_rows:
            d = a.asDict()
            key = (d.pop("e_rrname"), d.pop("e_sensor_id"), d.pop("e_rdata"))
            by_entry.setdefault(key, []).append(d)

    out = []
    for row in rows:
        item: dict[str, Any] = {}
        for f in sels:
            name = f["name"]
            if name == "id":
                # uuid per response entry (query_graphql.go:319-333)
                item["id"] = str(uuid.uuid4())
            elif name == "aliases":
                if row["rrtype"] in ("A", "AAAA"):
                    key = (row["rrname"], row["sensor_id"], row["rdata"])
                    item["aliases"] = [
                        {g["name"]: a[g["name"]] for g in f["selections"]}
                        for a in by_entry.get(key, [])
                    ]
                else:
                    item["aliases"] = None
            else:
                item[name] = row[name]
        out.append(item)
    return out


def _exec_stats(store, field, stats) -> dict:
    sels = field["selections"]
    if not sels:
        raise GraphQLError("Field 'stats' of type 'Stats' must have a selection.")
    _check_fields(sels, frozenset({"total_count", "num_goroutines"}), "Stats")
    out = {}
    for f in sels:
        if f["name"] == "total_count":
            out["total_count"] = store.forward().count()
        else:
            out["num_goroutines"] = store.spark.sparkContext.defaultParallelism
    return out
