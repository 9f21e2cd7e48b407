"""Snapshot-committed index storage — the Iceberg-shaped backend.

Emulates the Iceberg table-commit protocol (the production deployment's
storage layer) with the same public API as :class:`IndexStorage`, replacing
per-stage directory swaps with ONE atomic metadata-pointer flip — exactly
the role ``segments_N`` + ``SegmentInfos`` play in the reference
(src/Lucene.Net/Index/SegmentInfos.cs:55-119: write pending generation,
fsync, publish by pointer) and what an Iceberg snapshot commit does on a
real catalog:

- data files are IMMUTABLE: every stage write lands in a fresh
  ``<root>/data/<stage>/<n>/`` directory that is never renamed or rewritten;
- a snapshot manifest ``<root>/metadata/v{N}.json`` maps each stage to its
  current data directory + commit metadata (fingerprint, counters);
- ``<root>/metadata/version-hint.text`` names the current snapshot (the
  HadoopTables version-hint mechanism); commits write ``v{N+1}.json`` then
  flip the hint via tmp+rename — readers either see all of snapshot N+1 or
  all of snapshot N, never a mix;
- a multi-stage compaction publish is ONE snapshot commit: the rebuilt
  stage set becomes visible in a single hint flip, and absorbed delta
  generations / applied tombstones are recorded as ``drop_dirs`` in the
  manifest for idempotent roll-forward GC at the reader choke point
  (``delta_dirs()``) — a crash anywhere around the flip can never
  double-count delta docs;
- old snapshots remain readable until GC (time travel on real Iceberg);
  ``gc_snapshots()`` drops unreferenced data dirs + old manifests.

On a real cluster this module swaps for ``df.writeTo(table)`` against an
Iceberg catalog; the stage protocol (fingerprint check, skip-if-committed,
single-commit visibility) is identical, which is the point of the seam.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from .storage import FINAL_STAGE, IndexStorage

VERSION_HINT = "version-hint.text"


class SnapshotStorage(IndexStorage):
    # ------------------------------------------------------------------ #
    # snapshot plumbing
    # ------------------------------------------------------------------ #
    def _meta_dir(self) -> str:
        return os.path.join(self.root, "metadata")

    def _hint_path(self) -> str:
        return os.path.join(self._meta_dir(), VERSION_HINT)

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._meta_dir(), f"v{version:012d}.json")

    def current_version(self) -> int:
        try:
            with open(self._hint_path()) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return 0

    def current_snapshot(self) -> dict:
        """The committed manifest, or an empty one. Orphan ``v*.json`` files
        beyond the hint (a crash between manifest write and hint flip) are
        simply never read — the old snapshot stays current."""
        v = self.current_version()
        if v == 0:
            return {"snapshot_id": 0, "stages": {}, "drop_dirs": []}
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def _commit_snapshot(self, snap: dict, expected_base: int | None = None) -> dict | None:
        """Write v{N+1}.json then flip the hint — the single atomic action,
        serialized across processes on this host by an exclusive flock on
        ``metadata/commit.lock`` (the local-FS stand-in for an Iceberg
        catalog's atomic swap; like HadoopTables, this is host-local — a
        shared-nothing object store would swap this seam for the catalog's
        own CAS).

        ``expected_base`` turns the commit into a compare-and-swap: if the
        CURRENT version (re-read under the lock) is no longer
        ``expected_base``, the commit is REJECTED and ``None`` returned —
        a reader-side housekeeping commit (the drop_dirs clearing commit)
        must never clobber a writer's stage entries. Writers omit it and
        always win, which preserves the single-writer operational model
        while making concurrent commits version-monotonic (the lock covers
        read-version → write-manifest → flip-hint, so two commits can
        never race each other's hint flips backwards)."""
        import fcntl  # noqa: PLC0415 — POSIX-only, like the rest of the local backend

        os.makedirs(self._meta_dir(), exist_ok=True)
        lock_path = os.path.join(self._meta_dir(), "commit.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            cur = self.current_version()
            if expected_base is not None and cur != expected_base:
                return None  # lost the race to a writer — leave state alone
            v = cur + 1
            while os.path.exists(self._manifest_path(v)):
                v += 1
            snap = {**snap, "snapshot_id": v, "committed_at": time.time()}
            mpath = self._manifest_path(v)
            tmp = mpath + ".__tmp__"
            with open(tmp, "w") as f:
                json.dump(snap, f, indent=2)
            os.rename(tmp, mpath)
            htmp = self._hint_path() + ".__tmp__"
            with open(htmp, "w") as f:
                f.write(str(v))
            os.rename(htmp, self._hint_path())  # ATOMIC visibility flip
        return snap

    # ------------------------------------------------------------------ #
    # IndexStorage API
    # ------------------------------------------------------------------ #
    def path(self, stage: str) -> str:
        """Resolve the stage's CURRENT data directory via the manifest."""
        st = self.current_snapshot()["stages"].get(stage)
        if st is None:
            # unpublished stage: a deterministic would-be path (read errors
            # surface as missing-parquet, same as the dirs backend)
            return os.path.join(self.root, "data", stage, "0")
        return os.path.join(self.root, st["dir"])

    def is_committed(self, stage: str, fingerprint: str) -> bool:
        st = self.current_snapshot()["stages"].get(stage)
        return bool(st) and st["meta"].get("fingerprint") == fingerprint

    def commit_meta(self, stage: str) -> dict:
        st = self.current_snapshot()["stages"].get(stage)
        if st is None:
            raise FileNotFoundError(f"stage {stage!r} not committed in {self.root}")
        return st["meta"]

    def write_stage(
        self,
        df: DataFrame,
        stage: str,
        fingerprint: str,
        meta: dict | None = None,
        sort_columns: list[str] | None = None,
        range_partition_column: str | None = None,
        num_files: int | None = None,
        partition_by: list[str] | None = None,
        compression: str | None = None,
    ) -> dict:
        """Write an immutable data dir, then commit a snapshot pointing the
        stage at it. A crash before the commit leaves an invisible orphan
        dir (GC'd later); there is no torn-visibility window."""
        snap = self.current_snapshot()
        prev = snap["stages"].get(stage)
        n = int(os.path.basename(prev["dir"])) + 1 if prev else 0
        rel = os.path.join("data", stage, str(n))
        out = os.path.join(self.root, rel)
        if os.path.exists(out):  # orphan from a crashed earlier attempt
            shutil.rmtree(out)
        w = df
        if range_partition_column is not None:
            if num_files:
                w = w.repartitionByRange(num_files, range_partition_column)
            else:
                w = w.repartitionByRange(range_partition_column)
        if sort_columns:
            w = w.sortWithinPartitions(*sort_columns)
        writer = w.write.mode("overwrite")
        if compression:
            writer = writer.option("compression", compression)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        commit = {
            "stage": stage,
            "fingerprint": fingerprint,
            "committed_at": time.time(),
            **(meta or {}),
        }
        stages = dict(snap["stages"])
        stages[stage] = {"dir": rel, "meta": commit}
        self._commit_snapshot({"stages": stages, "drop_dirs": snap.get("drop_dirs", [])})
        return commit

    def read_stage(self, spark: SparkSession, stage: str, schema: str | None = None) -> DataFrame:
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.parquet(self.path(stage))

    def delta_dirs(self) -> list[str]:
        """Committed delta generations. A generation is visible only once
        its OWN snapshot has the FINAL stage (same lineage-keyed contract as
        the dirs backend). Runs the pending-drop GC first — the reader
        choke point rolls an interrupted compaction cleanup forward, so an
        absorbed generation can never be double-counted."""
        self.recover_pending_compaction()
        base = os.path.join(self.root, "deltas")
        if not os.path.isdir(base):
            return []
        out = []
        for name in sorted(os.listdir(base)):
            d = os.path.join(base, name)
            child = SnapshotStorage(d)
            if FINAL_STAGE in child.current_snapshot()["stages"]:
                out.append(d)
        return out

    # ------------------------------------------------------------------ #
    # compaction publish: ONE snapshot commit
    # ------------------------------------------------------------------ #
    def begin_compaction_publish(self, tmp_root: str, stages: list[str], drop: list[str]) -> None:
        """Publish a compaction built in ``tmp_root`` (itself a
        SnapshotStorage) as a single snapshot commit on this root:

        1. move each rebuilt stage's data dir under this root (invisible —
           nothing references it yet);
        2. commit ONE manifest mapping every stage to its new dir, dropping
           the stages in ``drop`` and recording plain-dir drops
           (deltas/tombstones) as ``drop_dirs``;
        3. GC (idempotent; re-run by every reader via delta_dirs()).

        Visibility flips on the hint rename inside the commit — before it
        readers see base+deltas, after it the compacted base. On real
        Iceberg this is the snapshot commit verbatim."""
        src = SnapshotStorage(tmp_root)
        ssnap = src.current_snapshot()
        snap = self.current_snapshot()
        new_stages: dict = {}
        for stage in stages:
            entry = ssnap["stages"][stage]
            # unique target name: continue this root's numbering
            prev = snap["stages"].get(stage)
            n = int(os.path.basename(prev["dir"])) + 1 if prev else 0
            rel = os.path.join("data", stage, str(n))
            dst = os.path.join(self.root, rel)
            if os.path.exists(dst):
                shutil.rmtree(dst)  # orphan of a crashed earlier publish
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(os.path.join(tmp_root, entry["dir"]), dst)
            new_stages[stage] = {"dir": rel, "meta": entry["meta"]}
        # stale data dirs of dropped/replaced stages + plain dirs to GC.
        # Plain dirs (deltas/, tombstones/) are expanded to their CURRENT
        # children: a drop entry must never name a path a future append or
        # delete could recreate (a recreated deltas/000000 would otherwise
        # be silently GC'd by a later reader's roll-forward).
        drop_dirs = []
        for d in drop:
            p = os.path.join(self.root, d)
            if os.path.isdir(p) and d not in snap["stages"]:
                drop_dirs.extend(os.path.join(d, child) for child in os.listdir(p))
            elif os.path.exists(p):
                drop_dirs.append(d)
        for stage, entry in snap["stages"].items():
            if stage in drop or stage in new_stages:
                drop_dirs.append(entry["dir"])
        self._commit_snapshot({"stages": new_stages, "drop_dirs": drop_dirs})
        shutil.rmtree(tmp_root, ignore_errors=True)
        self.recover_pending_compaction()

    def recover_pending_compaction(self) -> bool:
        """GC the current manifest's ``drop_dirs`` (absorbed deltas, applied
        tombstones, superseded data dirs). Idempotent roll-forward: called
        from delta_dirs() so a crash mid-cleanup is repaired by the next
        reader. The visibility flip itself needs NO recovery — it is a
        single rename.

        Once every drop is gone the manifest is re-committed with
        ``drop_dirs`` CLEARED (the expire-snapshots commit of real
        Iceberg): a stale drop entry must not outlive its GC, or a later
        append/delete that recreates the same relative path (delta
        numbering restarts after a compaction) would be destroyed by the
        next reader's roll-forward. The clearing commit is a true CAS:
        ``_commit_snapshot(expected_base=...)`` re-checks the current
        version UNDER the commit flock and rejects the commit if any
        writer landed after this roll-forward read its snapshot (a reader
        must never clobber a writer's stage entries); on a lost race the
        drop_dirs stay pending and the NEXT roll-forward — which will see
        the writer's manifest — clears them (the physical deletes are
        idempotent)."""
        snap = self.current_snapshot()
        pending = snap.get("drop_dirs", [])
        if not pending:
            return False
        dropped = False
        parents = set()
        for rel in pending:
            p = os.path.join(self.root, rel)
            parents.add(os.path.dirname(p))
            if os.path.isdir(p):
                shutil.rmtree(p)
                dropped = True
            elif os.path.exists(p):
                os.remove(p)
                dropped = True
        # prune parents the child-level drops emptied (deltas/, tombstones/)
        for parent in parents:
            if (
                os.path.normpath(parent) != os.path.normpath(self.root)
                and os.path.isdir(parent)
                and not os.listdir(parent)
            ):
                os.rmdir(parent)
        self._commit_snapshot(
            {"stages": snap["stages"], "drop_dirs": []},
            expected_base=int(snap.get("snapshot_id", 0)),
        )
        return dropped

    # ------------------------------------------------------------------ #
    def gc_snapshots(self) -> int:
        """Expire-snapshots analogue: delete manifests older than current
        and data dirs no snapshot references. Returns dirs removed."""
        snap = self.current_snapshot()
        live = {os.path.join(self.root, e["dir"]) for e in snap["stages"].values()}
        removed = 0
        data = os.path.join(self.root, "data")
        if os.path.isdir(data):
            for stage in os.listdir(data):
                sdir = os.path.join(data, stage)
                for n in os.listdir(sdir):
                    p = os.path.join(sdir, n)
                    if p not in live:
                        shutil.rmtree(p)
                        removed += 1
        v = self.current_version()
        if os.path.isdir(self._meta_dir()):
            for name in os.listdir(self._meta_dir()):
                if name.startswith("v") and name.endswith(".json"):
                    try:
                        if int(name[1:-5]) != v:
                            os.remove(os.path.join(self._meta_dir(), name))
                    except ValueError:
                        pass
        return removed


def get_storage(root: str, like: IndexStorage | None = None) -> IndexStorage:
    """Storage factory: detect the backend of an EXISTING index by its
    on-disk layout (a snapshot index has metadata/version-hint.text), or
    inherit the backend of ``like`` when creating a new directory (delta
    generations and compaction temp roots use their parent's backend)."""
    if isinstance(like, SnapshotStorage):
        return SnapshotStorage(root)
    if os.path.exists(os.path.join(root, "metadata", VERSION_HINT)):
        return SnapshotStorage(root)
    return IndexStorage(root)
