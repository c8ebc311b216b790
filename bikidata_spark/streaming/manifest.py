"""Versioned snapshot manifests for the log-structured quad store.

The append-only store (``mutations.py``) gains what a table format like
Delta/Iceberg provides on an object store: an atomically-published
manifest per version listing exactly the data files in that snapshot.

- Writers append parquet files freely (never rewriting existing data),
  then ``commit_snapshot`` publishes a new version whose manifest pins
  the current file set. Publication is a hard-link of a fully-written
  temp file onto ``v{N}.json`` — link fails if the version already
  exists, so two racing committers cannot both claim N (the simplified
  single-table optimistic-concurrency rule).
- Readers (``read_snapshot``) load only the files a manifest lists:
  snapshot isolation while writers keep appending, and time travel by
  passing an older version.
- ``vacuum`` deletes data files referenced only by dropped manifests —
  files newer than every retained manifest are kept, since they belong
  to appends that have not committed yet.

Reference counterpart: bikidata rebuilds or mutates one DuckDB file in
place (reference query.py:468-617); at 100 TB the store must instead be
immutable files + a tiny commit protocol, which is this module.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession

from ..graph import Graph
from .mutations import read_store  # noqa: F401  (compact_store refuses when _manifest exists)

SUBDIRS = ("triples", "terms", "tombstones")


def _manifest_dir(store_dir: str) -> str:
    return os.path.join(store_dir, "_manifest")


def _data_files(store_dir: str, sub: str) -> list[str]:
    root = os.path.join(store_dir, sub)
    out: list[str] = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(dirpath, f), store_dir)
                out.append(rel)
    return sorted(out)


def versions(store_dir: str) -> list[int]:
    md = _manifest_dir(store_dir)
    if not os.path.isdir(md):
        return []
    out = []
    for f in os.listdir(md):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                pass
    return sorted(out)


def read_manifest(store_dir: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(store_dir), f"v{version}.json")) as fh:
        return json.load(fh)


def commit_snapshot(store_dir: str) -> int:
    """Pin the store's current file set as the next version; returns the
    version number. Atomic: the manifest is fully written to a temp path
    first, then hard-linked into place — a concurrent committer racing
    for the same version number loses the link and retries on N+1."""
    md = _manifest_dir(store_dir)
    os.makedirs(md, exist_ok=True)
    manifest = {
        "files": {sub: _data_files(store_dir, sub) for sub in SUBDIRS},
        "committed_at": time.time(),
    }
    while True:
        version = (versions(store_dir) or [0])[-1] + 1
        manifest["version"] = version
        tmp = os.path.join(md, f".tmp-v{version}-{os.getpid()}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            os.link(tmp, os.path.join(md, f"v{version}.json"))
            return version
        except FileExistsError:
            continue  # lost the race for this version number
        finally:
            os.unlink(tmp)


def read_snapshot(
    spark: SparkSession, store_dir: str, version: int | None = None
) -> Graph:
    """Load one committed snapshot as a Graph (latest when ``version``
    is None): exactly the manifest's files — concurrent appends are
    invisible, and older versions remain readable until vacuumed."""
    from pyspark.sql import functions as F

    vs = versions(store_dir)
    if not vs:
        raise FileNotFoundError(f"no committed snapshots under {store_dir}")
    version = vs[-1] if version is None else version
    m = read_manifest(store_dir, version)

    def load(sub: str):
        files = [os.path.join(store_dir, f) for f in m["files"][sub]]
        return spark.read.parquet(*files) if files else None

    triples = load("triples").distinct()
    tombstones = load("tombstones")
    if tombstones is not None:
        triples = triples.join(
            tombstones.distinct(), ["s", "p", "o", "g"], "left_anti"
        )
    terms = (
        load("terms")
        .groupBy("hash")
        .agg(F.first("value").alias("value"), F.first("is_literal").alias("is_literal"))
    )
    return Graph(triples=triples, terms=terms)


def vacuum(store_dir: str, keep_last: int = 1) -> dict:
    """Drop all but the last ``keep_last`` manifests and delete data
    files that only those dropped manifests referenced. Files referenced
    by no manifest at all are uncommitted appends and are left alone."""
    vs = versions(store_dir)
    kept_vs, dropped_vs = vs[-keep_last:], vs[:-keep_last]
    kept: set[str] = set()
    for v in kept_vs:
        m = read_manifest(store_dir, v)
        for sub in SUBDIRS:
            kept.update(m["files"][sub])
    removed = []
    for v in dropped_vs:
        m = read_manifest(store_dir, v)
        for sub in SUBDIRS:
            for rel in m["files"][sub]:
                path = os.path.join(store_dir, rel)
                if rel not in kept and os.path.exists(path):
                    os.unlink(path)
                    removed.append(rel)
        os.unlink(os.path.join(_manifest_dir(store_dir), f"v{v}.json"))
    return {"dropped_versions": dropped_vs, "removed_files": sorted(set(removed))}
