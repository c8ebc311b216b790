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

SUBDIRS = ("triples", "terms", "tombstones", "tombstones_spg")
# index stores get the same commit protocol: their segment files are
# pinned per version so time travel and vacuum compose with index
# maintenance (streaming.fts appends / compact_fts_store folds)
FTS_SUBDIRS = ("postings", "token_df", "doc_len", "stats", "seen", "meta")
IVF_SUBDIRS = ("vectors", "centroids")


def _detect_subdirs(store_dir: str) -> tuple[str, ...]:
    """Which store layout lives here: quad log (triples/...), FTS index
    (postings/...), or IVF vector store (vectors/...)."""
    if os.path.isdir(os.path.join(store_dir, "postings")):
        return FTS_SUBDIRS
    if os.path.isdir(os.path.join(store_dir, "vectors")):
        return IVF_SUBDIRS
    return SUBDIRS


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


def commit_snapshot(store_dir: str, subdirs: tuple[str, ...] | None = None) -> int:
    """Pin the store's current file set as the next version; returns the
    version number. Atomic: the manifest is fully written to a temp path
    first, then hard-linked into place — a concurrent committer racing
    for the same version number loses the link and retries on N+1.

    Works over any of the package's store layouts (quad log, FTS index,
    IVF vector store) — the subdir set is auto-detected unless given."""
    md = _manifest_dir(store_dir)
    os.makedirs(md, exist_ok=True)
    subdirs = subdirs or _detect_subdirs(store_dir)
    manifest = {
        "files": {sub: _data_files(store_dir, sub) for sub in subdirs},
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

    def load(sub: str, with_batch: bool = False):
        # older manifests predate tombstones_spg — treat as absent
        files = [os.path.join(store_dir, f) for f in m["files"].get(sub, [])]
        if not files:
            return None
        if not with_batch:
            return spark.read.parquet(*files)
        # keep the batch partition column (tombstone SEQUENCING needs
        # it): basePath makes partition discovery work on leaf files
        df = spark.read.option("basePath", os.path.join(store_dir, sub)).parquet(*files)
        if "batch" in df.columns:
            return df.withColumn("_b", F.col("batch").cast("long")).drop("batch")
        return df.withColumn("_b", F.lit(-1).cast("long"))

    from .mutations import resolve_triples

    triples = resolve_triples(
        load("triples", with_batch=True),
        load("tombstones", with_batch=True),
        load("tombstones_spg", with_batch=True),
    )
    terms = (
        load("terms")
        .groupBy("hash")
        .agg(F.first("value").alias("value"), F.first("is_literal").alias("is_literal"))
    )
    return Graph(triples=triples, terms=terms)


def _manifest_for(store_dir: str, version: int | None) -> dict:
    vs = versions(store_dir)
    if not vs:
        raise FileNotFoundError(f"no committed snapshots under {store_dir}")
    return read_manifest(store_dir, vs[-1] if version is None else version)


def _load_pinned(spark: SparkSession, store_dir: str, m: dict, sub: str):
    """Read exactly one subdir's pinned files. ``basePath`` keeps the
    partition columns (batch/bucket/cell) that directory names carry —
    a plain multi-file read would lose them and with them the pruning."""
    files = [os.path.join(store_dir, f) for f in m["files"].get(sub, [])]
    if not files:
        return None
    return spark.read.option("basePath", os.path.join(store_dir, sub)).parquet(*files)


def read_fts_snapshot(spark: SparkSession, store_dir: str, version: int | None = None):
    """Open one committed version of an incremental FTS store as an
    FtsIndex: exactly the manifest's segment files, so later appends
    and compactions are invisible and old versions stay queryable until
    vacuumed. Bucket pruning works as in ``read_incremental_fts``."""
    from pyspark.sql import functions as F

    from ..operators.fts import FtsIndex

    m = _manifest_for(store_dir, version)
    meta = _load_pinned(spark, store_dir, m, "meta").collect()[0]
    postings = _load_pinned(spark, store_dir, m, "postings").drop("batch")
    token_df = (
        _load_pinned(spark, store_dir, m, "token_df")
        .drop("batch")
        .groupBy("bucket", "token")
        .agg(F.sum("df").alias("df"))
    )
    doc_len = _load_pinned(spark, store_dir, m, "doc_len").drop("batch")
    stats = (
        _load_pinned(spark, store_dir, m, "stats")
        .agg(F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("s"))
        .collect()[0]
    )
    n_docs = int(stats["n"] or 0)
    return FtsIndex(
        postings=postings,
        token_df=token_df,
        doc_len=doc_len,
        n_docs=n_docs,
        avgdl=(stats["s"] / n_docs) if n_docs else 1.0,
        num_buckets=int(meta["num_buckets"]),
        stem=bool(meta["stem"]),
        strip=bool(meta["strip"]),
    )


def read_ivf_snapshot(spark: SparkSession, store_dir: str, version: int | None = None):
    """(vectors, centroids) of one committed IVF-store version; the
    ``cell`` partition column survives for pruned probes."""
    m = _manifest_for(store_dir, version)
    return (
        _load_pinned(spark, store_dir, m, "vectors"),
        _load_pinned(spark, store_dir, m, "centroids"),
    )


def vacuum(store_dir: str, keep_last: int = 1) -> dict:
    """Drop all but the last ``keep_last`` manifests and delete data
    files that only those dropped manifests referenced. Files referenced
    by no manifest at all are uncommitted appends and are left alone."""
    vs = versions(store_dir)
    # keep_last=0 drops every version PIN but deletes no data: the live
    # tree is not a manifest, and "discard the snapshots" must not be
    # "delete the store". (Also note vs[-0:] would keep them all — the
    # negative-zero slice trap.)
    if keep_last < 1:
        for v in vs:
            os.unlink(os.path.join(_manifest_dir(store_dir), f"v{v}.json"))
        return {"dropped_versions": vs, "removed_files": []}
    kept_vs = vs[-keep_last:]
    dropped_vs = vs[: len(vs) - len(kept_vs)]
    kept: set[str] = set()
    for v in kept_vs:
        m = read_manifest(store_dir, v)
        for sub in m["files"]:  # whatever layout the manifest pinned
            kept.update(m["files"][sub])
    removed = []
    for v in dropped_vs:
        m = read_manifest(store_dir, v)
        for sub in m["files"]:
            for rel in m["files"][sub]:
                path = os.path.join(store_dir, rel)
                if rel not in kept and os.path.exists(path):
                    os.unlink(path)
                    removed.append(rel)
        os.unlink(os.path.join(_manifest_dir(store_dir), f"v{v}.json"))
    return {"dropped_versions": dropped_vs, "removed_files": sorted(set(removed))}
