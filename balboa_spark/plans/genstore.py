"""Shared generation-store plumbing.

Three persisted artifacts in this engine follow the same lakehouse
commit model (ObservationStore in plans/layout.py, VectorStore in
operators/vector_store.py, PostingsIndex in operators/search.py):
immutable ``gen-<n>/`` snapshot directories, a single atomic
``manifest.json`` rename as THE commit point, hard-linked carry-over
of untouched partitions between generations, and a keep-last-K vacuum.
This module is the one copy of that plumbing so a semantics fix (e.g.
the stray-directory guard in vacuum, or the tmp-file commit protocol)
lands everywhere at once.

Reference parity note: the reference's rocksdb backend gets these
properties from the storage engine itself (backend/balboa-rocksdb,
WAL + immutable SSTs); on Spark-over-parquet they are reconstructed
with the Iceberg/Delta manifest pattern instead.
"""

from __future__ import annotations

import json
import os
import shutil


def link_tree(src: str, dst: str) -> None:
    """Hard-link every file under src into the same relative path under
    dst — O(#files) metadata ops, zero data movement. Parquet files are
    immutable once written, so shared blocks are safe."""
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        target = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(target, exist_ok=True)
        for fn in files:
            os.link(os.path.join(root, fn), os.path.join(target, fn))


def flip_manifest(path: str, man: dict, manifest_name: str) -> None:
    """The one commit point: write-to-tmp + atomic rename of the
    manifest. Everything before this call is invisible to readers;
    everything after it is the new current state."""
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, manifest_name + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(man, fh)
    os.replace(tmp, os.path.join(path, manifest_name))


def vacuum_generations(path: str, current_gen: int, keep_last: int) -> int:
    """Drop ``gen-<n>`` directories older than the newest ``keep_last``
    (keeping the previous generation by default so in-flight readers
    with cached plans against the old file set stay valid). Returns
    the retention floor. Strictly numeric suffixes only: a stray
    ``gen-1.bak`` must not abort a commit's vacuum with ValueError."""
    floor = current_gen - keep_last + 1
    for entry in os.listdir(path):
        if entry.startswith("gen-") and entry[4:].isdigit():
            if int(entry[4:]) < floor:
                shutil.rmtree(os.path.join(path, entry), ignore_errors=True)
    return floor
