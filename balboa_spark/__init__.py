"""balboa_spark — a PySpark-native passive-DNS analytics engine.

A from-scratch reimplementation of the *capabilities* of DCSO/balboa
(reference at /root/reference) on Apache Spark:

- ingest: normalize 6 sensor wire formats into one observation stream
  (reference: format/*.go)
- aggregate: fold the stream into the `observations` table keyed by
  (rrname, sensor_id, rrtype, rdata) with (SUM, MIN, MAX)
  (reference: backend/balboa-rocksdb/rocksdb-impl.c:117-121)
- store: dual sorted/bucketed Parquet layout (forward by rrname,
  inverted by rdata), mirroring the reference's `o`/`i` keyspaces
  (reference: rocksdb-impl.c:772-800)
- query: point/prefix lookups, residual filters, limit, alias
  self-join, dual-search union, CIDR range search
  (reference: query/query_graphql.go, query/query_rest.go)
- selector engine: tag rules (regex + scriptable) with tag-routed
  multi-sink output (reference: selector/, db/db_remote.go)
- scale extensions: dedup (exact/minhash/simhash/jaccard/embedding),
  similarity search, text analysis, multimodal column plumbing.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join strategy, and partial aggregation. No RDDs.
"""

__version__ = "0.6.0"
