"""Iceberg-style snapshot catalog for the index tables: versioned commits,
time travel, rollback, snapshot isolation (north_rule "resumable from
Iceberg snapshot checkpoints"; SURVEY.md §7 documents the sandbox
fallback — the Iceberg runtime jar is absent here, so the catalog
emulates the METADATA semantics over plain parquet + JSON).

What is real Iceberg-shaped about it:

- **File-list manifests, not directory listing.** Every commit records
  the exact parquet part-files of every table; readers plan from the
  manifest (`spark.read.parquet(*files)`), so a half-written directory
  or a concurrent writer's files are invisible — the Iceberg reader
  contract.
- **Immutable data, atomic metadata.** A commit writes data into a NEW
  `snap=<id>` directory (never touching prior files) and then swaps
  `snapshots.json` via tmp+rename — the same single-atomic-pointer
  design as Iceberg's metadata.json. Readers holding an older snapshot
  keep a consistent view through any number of later commits or
  rollbacks (snapshot isolation); only `expire()` deletes data, and it
  refuses to touch snapshots still in the retention set.
- **Append = manifest merge.** An append commit reuses the parent's
  file list and adds the new files — no rewrite of existing data, the
  file-level append Iceberg does with manifest reuse.
- **Rollback = new metadata, old files.** `rollback(sid)` commits a new
  snapshot entry whose manifest IS the old one's — history is never
  destroyed (Iceberg's rollback semantics), so the rollback itself can
  be rolled back.

Two racing WRITERS are FENCED, not merged: publish re-reads the pointer
and fails with ConcurrentCommitError if `current` moved since the
operation started (compare-parent-and-fail — the loser's files are
orphans, the winner's snapshot is intact). What is NOT emulated:
automatic retry of the losing writer (Iceberg's optimistic-concurrency
loop; callers retry from a fresh read), a true store-level CAS for the
re-read→rename window (real catalogs use the store's conditional put),
and format-level features (row deletes, schema evolution, hidden
partitioning). The API is kept thin so real `writeTo().append()`
/ `VERSION AS OF` calls drop in unchanged on a cluster with the
Iceberg runtime.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession


class ConcurrentCommitError(RuntimeError):
    """Another writer published a snapshot after this commit started —
    the losing writer's data files are orphans (invisible to readers,
    reclaimable like any crashed attempt); retry the operation from a
    fresh read. The Iceberg analog is the optimistic-concurrency
    CommitFailedException."""


class SnapshotCatalog:
    """A tiny multi-table catalog: one snapshot log covering a set of
    named tables that must stay mutually consistent (for the index:
    docstats / dictionary / postings / blocks — a reader must never see
    v2 postings with a v1 dictionary, which per-table versioning would
    allow)."""

    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)

    # ------------------------------------------------------------ metadata

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.workdir, "snapshots.json")

    def _read_meta(self) -> dict:
        if not os.path.exists(self._meta_path):
            return {"current": None, "snapshots": []}
        with open(self._meta_path) as f:
            return json.load(f)

    def _commit_meta(self, meta: dict) -> None:
        tmp = self._meta_path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._meta_path)  # the single atomic pointer swap

    def history(self) -> List[dict]:
        return self._read_meta()["snapshots"]

    def current_snapshot(self) -> Optional[dict]:
        meta = self._read_meta()
        if meta["current"] is None:
            return None
        return next(s for s in meta["snapshots"] if s["snapshot_id"] == meta["current"])

    def _resolve(
        self, snapshot_id: Optional[int] = None, as_of_ms: Optional[int] = None
    ) -> dict:
        meta = self._read_meta()
        if not meta["snapshots"]:
            raise ValueError(f"no snapshots committed under {self.workdir}")
        if snapshot_id is not None:
            for s in meta["snapshots"]:
                if s["snapshot_id"] == snapshot_id:
                    return s
            raise ValueError(f"unknown snapshot_id {snapshot_id}")
        if as_of_ms is not None:
            live = [s for s in meta["snapshots"] if s["timestamp_ms"] <= as_of_ms]
            if not live:
                raise ValueError(f"no snapshot at or before ts {as_of_ms}")
            return max(live, key=lambda s: s["timestamp_ms"])
        return self.current_snapshot()

    # --------------------------------------------------------------- write

    def _write_table(self, name: str, df: DataFrame, sid: int) -> List[str]:
        """Write df into a fresh snap dir; return its part-file list.
        Existing snapshots' files are never touched (immutability). The
        uuid suffix keeps a crashed earlier attempt's unpublished dir
        from colliding with the retry — the orphan dir is invisible to
        readers (they plan from manifests), Iceberg's orphan-file
        story."""
        path = os.path.join(
            self.workdir, "data", name, f"snap-{sid}-{uuid.uuid4().hex[:8]}"
        )
        df.write.mode("errorifexists").parquet(path)
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )

    def commit(
        self,
        tables: Dict[str, DataFrame],
        operation: str = "overwrite",
        properties: Optional[dict] = None,
        timestamp_ms: Optional[int] = None,
    ) -> int:
        """Write every table and atomically publish a new snapshot whose
        manifest is exactly the new files (operation records intent;
        `overwrite` replaces the logical content, prior snapshots stay
        readable)."""
        meta = self._read_meta()
        sid = (max((s["snapshot_id"] for s in meta["snapshots"]), default=0)) + 1
        manifest = {name: self._write_table(name, df, sid) for name, df in tables.items()}
        return self._publish(meta, sid, operation, manifest, properties, timestamp_ms)

    def append(
        self,
        tables: Dict[str, DataFrame],
        properties: Optional[dict] = None,
        timestamp_ms: Optional[int] = None,
    ) -> int:
        """File-level append: the new manifest = parent's file lists +
        the newly written files. Tables absent from `tables` carry the
        parent manifest unchanged; no existing file is rewritten."""
        meta = self._read_meta()
        parent = self.current_snapshot()
        if parent is None:
            return self.commit(tables, "append", properties, timestamp_ms)
        sid = max(s["snapshot_id"] for s in meta["snapshots"]) + 1
        manifest = {k: list(v) for k, v in parent["manifest"].items()}
        for name, df in tables.items():
            manifest.setdefault(name, [])
            manifest[name] = manifest[name] + self._write_table(name, df, sid)
        return self._publish(meta, sid, "append", manifest, properties, timestamp_ms)

    def rollback(self, snapshot_id: int, timestamp_ms: Optional[int] = None) -> int:
        """Publish a NEW snapshot whose manifest is the target's — data
        files are shared, history is preserved (so a rollback can itself
        be rolled back)."""
        meta = self._read_meta()
        target = self._resolve(snapshot_id=snapshot_id)
        sid = max(s["snapshot_id"] for s in meta["snapshots"]) + 1
        return self._publish(
            meta,
            sid,
            f"rollback-to-{snapshot_id}",
            {k: list(v) for k, v in target["manifest"].items()},
            target.get("properties"),
            timestamp_ms,
        )

    def _publish(
        self,
        meta: dict,
        sid: int,
        operation: str,
        manifest: Dict[str, List[str]],
        properties: Optional[dict],
        timestamp_ms: Optional[int],
    ) -> int:
        # writer fencing (compare-parent-and-fail): `meta` was read when
        # the operation started; if another writer moved `current` since,
        # publishing would silently clobber its snapshot AND re-parent
        # this one onto a stale id. Fail instead — the caller retries
        # from a fresh read; this commit's data files are orphans. (The
        # re-read→rename window is not a lock — true multi-writer CAS
        # needs the store's conditional-put, which is exactly what the
        # real Iceberg catalog provides; this turns silent corruption
        # into an error, per the single-writer assumption above.)
        fresh = self._read_meta()
        if fresh["current"] != meta["current"]:
            raise ConcurrentCommitError(
                f"snapshot {fresh['current']} was published after this "
                f"operation started from parent {meta['current']}"
            )
        meta["snapshots"].append(
            {
                "snapshot_id": sid,
                "parent_id": meta["current"],
                "timestamp_ms": timestamp_ms if timestamp_ms is not None else int(time.time() * 1000),
                "operation": operation,
                "manifest": manifest,
                "properties": properties or {},
                "summary": {name: len(files) for name, files in manifest.items()},
            }
        )
        meta["current"] = sid
        self._commit_meta(meta)
        return sid

    # ---------------------------------------------------------------- read

    def read(
        self,
        table: str,
        snapshot_id: Optional[int] = None,
        as_of_ms: Optional[int] = None,
    ) -> DataFrame:
        """Plan from the snapshot's file list (NOT directory listing):
        concurrent or crashed writers' files are invisible. Default =
        current snapshot; `snapshot_id` / `as_of_ms` time travel."""
        snap = self._resolve(snapshot_id, as_of_ms)
        files = snap["manifest"].get(table)
        if files is None:
            raise ValueError(
                f"table {table!r} not in snapshot {snap['snapshot_id']}"
            )
        return self.spark.read.parquet(*files)

    def properties(
        self, snapshot_id: Optional[int] = None, as_of_ms: Optional[int] = None
    ) -> dict:
        return self._resolve(snapshot_id, as_of_ms).get("properties", {})

    # ------------------------------------------------------------ maintain

    # ------------------------------------------------------------- PIT

    def open_pit(self, pit_id: Optional[str] = None) -> dict:
        """Open a point-in-time handle pinned to the CURRENT snapshot —
        the ES `_pit` contract: searches through the handle keep reading
        this snapshot while the live index moves on, and `expire` will
        not reclaim a pinned snapshot until the PIT closes. Returns
        {"pit_id", "snapshot_id"}."""
        meta = self._read_meta()
        if meta["current"] is None:
            raise ValueError("no current snapshot to pin")
        pid = pit_id or uuid.uuid4().hex[:16]
        pits = meta.setdefault("pits", {})
        if pid in pits:
            raise ValueError(f"pit {pid!r} already open")
        pits[pid] = meta["current"]
        # same compare-parent fence as _publish: a commit that landed
        # since our read would be clobbered by this meta rewrite
        fresh = self._read_meta()
        if fresh["current"] != meta["current"]:
            raise ConcurrentCommitError(
                "snapshot published while opening the PIT — retry"
            )
        self._commit_meta(meta)
        return {"pit_id": pid, "snapshot_id": meta["current"]}

    def close_pit(self, pit_id: str) -> None:
        meta = self._read_meta()
        pits = meta.get("pits", {})
        if pit_id not in pits:
            raise KeyError(f"pit {pit_id!r} not open")
        del pits[pit_id]
        self._commit_meta(meta)

    def pits(self) -> Dict[str, int]:
        """{pit_id: pinned snapshot_id} of open handles."""
        return dict(self._read_meta().get("pits", {}))

    def expire(self, keep_last: int = 2) -> List[str]:
        """Drop all but the newest `keep_last` snapshots and delete data
        files no retained snapshot references (Iceberg expire_snapshots).
        Snapshots pinned by an open PIT are retained regardless of age.
        Returns the deleted file paths."""
        meta = self._read_meta()
        snaps = sorted(meta["snapshots"], key=lambda s: s["snapshot_id"])
        if len(snaps) <= keep_last:
            return []
        pinned = set(meta.get("pits", {}).values())
        kept = snaps[-keep_last:] + [
            s for s in snaps[:-keep_last] if s["snapshot_id"] in pinned
        ]
        dropped = [s for s in snaps[:-keep_last] if s["snapshot_id"] not in pinned]
        if not dropped:
            return []
        if meta["current"] not in {s["snapshot_id"] for s in kept}:
            raise ValueError("refusing to expire the current snapshot")
        live = {f for s in kept for fl in s["manifest"].values() for f in fl}
        dead = sorted(
            {f for s in dropped for fl in s["manifest"].values() for f in fl} - live
        )
        # publish the shrunk metadata FIRST; only then delete files — a
        # crash between the two leaks files but never breaks a reader
        meta["snapshots"] = sorted(kept, key=lambda s: s["snapshot_id"])
        self._commit_meta(meta)
        for f in dead:
            self._delete_file(f)
        return dead

    def _delete_file(self, path: str) -> None:
        """The object-store seam: expire's only mutation of data files.
        Local-fs here; on S3/GCS/HDFS subclass and route through the
        store's delete (real Iceberg delegates to its FileIO). Missing
        files are fine — a crashed earlier expire may have half-deleted."""
        try:
            os.remove(path)
        except FileNotFoundError:
            pass


# ---------------------------------------------------------------------------
# index integration
# ---------------------------------------------------------------------------


def snapshot_index(
    catalog: SnapshotCatalog,
    idx,
    operation: str = "full-build",
    timestamp_ms: Optional[int] = None,
) -> int:
    """Commit an InvertedIndex's tables as ONE consistent snapshot
    (stats ride the snapshot properties, like Iceberg table props)."""
    tables = {
        "docstats": idx.docstats,
        "dictionary": idx.dictionary,
        "postings": idx.postings,
    }
    if idx.blocks is not None:
        tables["blocks"] = idx.blocks
    if getattr(idx, "positions", None) is not None:
        tables["positions"] = idx.positions
    props = {"n_docs": idx.stats.n_docs, "avgdl": idx.stats.avgdl}
    if getattr(idx, "id_strategy", None):
        props["id_strategy"] = idx.id_strategy
    return catalog.commit(tables, operation, properties=props, timestamp_ms=timestamp_ms)


def load_index_at(
    catalog: SnapshotCatalog,
    snapshot_id: Optional[int] = None,
    as_of_ms: Optional[int] = None,
):
    """Time-travel loader: the InvertedIndex as of a snapshot id or
    timestamp (default current)."""
    from dpr_spark.index.build import IndexStats, InvertedIndex

    snap = catalog._resolve(snapshot_id, as_of_ms)
    props = snap.get("properties", {})
    has_blocks = "blocks" in snap["manifest"]
    has_pos = "positions" in snap["manifest"]
    sid = snap["snapshot_id"]
    return InvertedIndex(
        docstats=catalog.read("docstats", snapshot_id=sid),
        dictionary=catalog.read("dictionary", snapshot_id=sid),
        postings=catalog.read("postings", snapshot_id=sid),
        blocks=catalog.read("blocks", snapshot_id=sid) if has_blocks else None,
        stats=IndexStats(int(props["n_docs"]), float(props["avgdl"])),
        id_strategy=props.get("id_strategy"),
        positions=catalog.read("positions", snapshot_id=sid) if has_pos else None,
    )


class AliasRegistry:
    """ES-style index aliases over snapshot catalogs: a tiny JSON map
    alias -> {workdir, snapshot_id|None} with the same atomic
    tmp+rename publish as the catalog meta. `None` snapshot pins
    nothing — readers follow the target catalog's CURRENT snapshot, so
    a zero-downtime reindex is: build v2 into a NEW catalog, then one
    atomic `set()` — in-flight readers keep their already-resolved
    snapshot (snapshot isolation), new resolves see v2. A pinned
    snapshot_id makes the alias a stable named view (like an ES alias
    onto a frozen index)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _read(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _write(self, m: dict) -> None:
        tmp = self.path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self.path)

    def set(self, alias: str, workdir: str, snapshot_id: Optional[int] = None) -> None:
        m = self._read()
        m[alias] = {"workdir": workdir, "snapshot_id": snapshot_id}
        self._write(m)

    def drop(self, alias: str) -> None:
        m = self._read()
        if alias not in m:
            raise KeyError(f"alias {alias!r} not defined")
        del m[alias]
        self._write(m)

    def aliases(self) -> dict:
        return self._read()

    def resolve(self, spark: SparkSession, alias: str):
        """-> the InvertedIndex the alias points at right now."""
        m = self._read()
        if alias not in m:
            raise KeyError(f"alias {alias!r} not defined")
        t = m[alias]
        cat = SnapshotCatalog(spark, t["workdir"])
        return load_index_at(cat, snapshot_id=t.get("snapshot_id"))
