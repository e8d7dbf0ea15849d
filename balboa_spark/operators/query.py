"""Q1-Q4, J1, U1-U2, C1: the read-side operators.

The reference's entire logical plan language is 4 nullable equality
predicates + a limit (db/db_protocol.go:42-46), plus three composites:
the alias self-join (query/query_graphql.go:380-398), the REST
dual-search union (query/query_rest.go:41-82), and the client-side CIDR
expansion (cmd/balboa/cmds/query.go:41-57) which we promote to a real
range-predicate operator (the reference README itself wishes for this,
README.md:361-363).

Scan strategy at 100 TB: `entries` runs against whichever sorted layout
matches the driving predicate (rrname -> forward copy, rdata ->
inverted copy; see plans/planner.py), so the equality filter prunes to
one hash bucket and skips row groups via Parquet min/max on the sort
column — the columnar analog of the reference's prefix seek + early
break (rocksdb-impl.c:293-294,345-354).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from balboa_spark.functions.net import cidr_to_range, ip4_to_long
from balboa_spark.schemas import OBSERVATION_KEY

#: GraphQL/REST default result limit (query/query_graphql.go:179,
#: query/query_rest.go:22-24).
DEFAULT_LIMIT = 1000


@dataclass
class Query:
    """Mirror of the reference's QueryRequest (db/db_protocol.go:42-46)."""

    rdata: str | None = None
    rrname: str | None = None
    rrtype: str | None = None
    sensor_id: str | None = None
    limit: int = DEFAULT_LIMIT

    def validate(self) -> None:
        # query/query_graphql.go:242-246: at least one of rdata/rrname.
        if self.rdata is None and self.rrname is None:
            raise ValueError("query must provide rdata or rrname")
        if not isinstance(self.limit, int) or self.limit < 0:
            raise ValueError(f"limit must be a non-negative integer, got {self.limit!r}")


def _canonical(df: DataFrame) -> DataFrame:
    """Deterministic result order = the reference's key order
    (rrname, sensor_id, rrtype, rdata) — rocksdb-impl.c:772-783."""
    return df.orderBy(*OBSERVATION_KEY)


def entries(obs: DataFrame, q: Query) -> DataFrame:
    """Q1/Q2/Q3: point lookup with residual filters and limit.

    The driving predicate (rrname else rdata) plus residual equality
    filters (rocksdb-impl.c:356-377,525-538) all push down to the scan;
    dispatch between forward/inverted layout happens in plans/planner.py
    when a stored layout is used.
    """
    q.validate()
    df = obs
    if q.rrname is not None:
        df = df.filter(F.col("rrname") == q.rrname)
    elif q.rdata is not None:
        df = df.filter(F.col("rdata") == q.rdata)
    # residuals (F5)
    if q.rrname is not None and q.rdata is not None:
        df = df.filter(F.col("rdata") == q.rdata)
    if q.rrtype is not None:
        df = df.filter(F.col("rrtype") == q.rrtype)
    if q.sensor_id is not None:
        df = df.filter(F.col("sensor_id") == q.sensor_id)
    return _canonical(df).limit(q.limit)


def aliases(entry_df: DataFrame, obs: DataFrame, per_entry_limit: int = DEFAULT_LIMIT) -> DataFrame:
    """J1: for each A/AAAA entry, all entries sharing (rdata, sensor_id)
    with a different rrname (query/query_graphql.go:380-398).

    The reference issues one Search per entry (N+1); here it is a single
    join. The entry side of an interactive query is small -> broadcast
    it; Spark then streams the big observations table past an in-memory
    hash map with zero shuffle.

    Limit fidelity: the reference applies the per-entry limit to the
    SEARCH result (which still contains same-rrname rows) and excludes
    the entry's own rrname afterwards (query/query_graphql.go:385-390),
    so the cap binds pre-exclusion — reproduced here as a windowed
    row_number over all (rdata, sensor_id) matches in canonical key
    order (= the reference's scan order), then the exclusion filter.

    Output: entry key columns prefixed e_*, alias columns as-is.
    """
    e = (
        entry_df.filter(F.col("rrtype").isin("A", "AAAA"))
        .select(
            F.col("rrname").alias("e_rrname"),
            F.col("sensor_id").alias("e_sensor_id"),
            F.col("rdata").alias("e_rdata"),
        )
        .distinct()
    )
    joined = F.broadcast(e).join(
        obs,
        (F.col("e_rdata") == obs["rdata"]) & (F.col("e_sensor_id") == obs["sensor_id"]),
        "inner",
    )
    w = Window.partitionBy("e_rrname", "e_sensor_id", "e_rdata").orderBy(*OBSERVATION_KEY)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") <= per_entry_limit) & (F.col("e_rrname") != F.col("rrname")))
        .drop("_rn")
    )


def rest_search(obs: DataFrame, subject: str, limit: int = DEFAULT_LIMIT) -> DataFrame:
    """U2: CIRCL REST semantics — subject searched as rrname AND as
    rdata, results concatenated, duplicates preserved
    (query/query_rest.go:58-69; duplicate preservation documented at
    README.md:291-293). The limit applies PER SEARCH — the endpoint can
    return up to 2x limit rows, exactly like the reference (no global
    cap after the concatenation)."""
    r = entries(obs, Query(rrname=subject, limit=limit))
    d = entries(obs, Query(rdata=subject, limit=limit))
    return r.unionAll(d)


def cidr_search(
    obs: DataFrame,
    cidr: str,
    limit: int = DEFAULT_LIMIT,
    rrname: str | None = None,
    rrtype: str | None = None,
    sensor_id: str | None = None,
) -> DataFrame:
    """C1 promoted to an engine operator: rdata-as-IPv4 within a CIDR.

    The reference expands the CIDR client-side and issues one query per
    host (cmd/balboa/cmds/query.go:41-57, dropping network & broadcast
    for prefixes < /31). Here it is a single numeric range predicate —
    one scan, no fan-out, pushes down to Parquet.

    Residual equality filters (the GraphQL resolver's nullable
    predicates) compose with the range scan BEFORE the limit binds, as
    in the reference where every per-host Search carries all
    predicates — filtering after the limit would silently drop
    matching rows beyond the first `limit` CIDR hits.
    """
    lo, hi = cidr_to_range(cidr)
    ip = ip4_to_long(F.col("rdata"))
    df = obs.filter(ip.isNotNull() & (ip >= lo) & (ip <= hi))
    for colname, val in (("rrname", rrname), ("rrtype", rrtype), ("sensor_id", sensor_id)):
        if val is not None:
            df = df.filter(F.col(colname) == val)
    return _canonical(df).limit(limit)


def blocklist_match(
    obs: DataFrame,
    blocklist: DataFrame,
    name_col: str = "rrname",
    domain_col: str = "domain",
) -> DataFrame:
    """Wildcard threat-intel matching: an observation matches a
    blocklist entry when the entry equals its name OR any parent
    domain ('evil.example' matches 'c2.evil.example') — the standard
    indicator-feed semantics a passive-DNS store serves downstream
    (the reference's operators run exactly this against its query
    API; here it is one relation op).

    Plan shape: suffix-explode the observation names (bounded x-label
    fan-out, functions/strings.domain_suffixes) and equi-join the
    blocklist on the suffix — indicator feeds are small, so AQE
    broadcasts them; never a cartesian, never a per-row loop over
    patterns. Output: the matching observations with the matched
    ``domain`` attached (one row per (observation, matched entry) —
    a name under two indicators alerts twice, by design)."""
    from balboa_spark.functions.strings import domain_suffixes

    sfx = obs.withColumn("_sfx", F.explode(domain_suffixes(F.col(name_col))))
    return sfx.join(
        blocklist, sfx["_sfx"] == blocklist[domain_col]
    ).drop("_sfx")
