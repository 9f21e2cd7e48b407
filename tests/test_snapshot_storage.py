"""Snapshot-committed storage backend (Iceberg-shaped): same index, same
queries, atomic-visibility commits — and the round-2 crash-injection suite
ported to it (VERDICT r2 item 8).

Crash windows exercised:
- commit torn BEFORE the version-hint flip: the orphan manifest is invisible
  (readers stay on the old snapshot) and can never block later commits
- compaction crash AFTER the flip but BEFORE cleanup: the next reader's
  delta_dirs() rolls the GC forward — absorbed generations never double-count
- append crash BEFORE the final (lineage) stage: the generation is invisible
  and the SAME batch resumes it; a DIFFERENT batch never reuses its stages
"""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.data.pages import pages_spark_df
from lucenenet_spark.index import (
    IndexConfig,
    build_index,
    compact_index,
    delete_docs,
)
from lucenenet_spark.index.builder import IndexBuilder, append_index
from lucenenet_spark.index.checkindex import verify
from lucenenet_spark.index.snapshot_storage import SnapshotStorage, get_storage
from lucenenet_spark.index.storage import IndexStorage
from lucenenet_spark.query.ast import TermQuery
from lucenenet_spark.query.engine import Searcher

CFG = IndexConfig(num_partitions=4, bucket_width=2, flush_docs=64)


def _build(spark, tmp_path, n=100, seed=9):
    out = str(tmp_path / "snapidx")
    pages = pages_spark_df(spark, n, seed=seed)
    build_index(spark, pages, out, CFG, backend="snapshot")
    return out, pages


def test_backend_detection_and_rank_identity(spark, tmp_path):
    """Same corpus, both backends: identical search results; get_storage
    auto-detects each."""
    out_s, pages = _build(spark, tmp_path)
    out_d = str(tmp_path / "dirsidx")
    build_index(spark, pages, out_d, CFG, backend="dirs")
    assert isinstance(get_storage(out_s), SnapshotStorage)
    assert type(get_storage(out_d)) is IndexStorage
    q = TermQuery("tiger")
    rs = [(r.docid, float(r.score)) for r in Searcher(spark, out_s).search(q, 10).collect()]
    rd = [(r.docid, float(r.score)) for r in Searcher(spark, out_d).search(q, 10).collect()]
    assert rs == rd and rs


def test_orphan_manifest_invisible_and_not_blocking(spark, tmp_path):
    """A manifest written without the hint flip (crash window) is never
    read; the next real commit skips past its version number."""
    out, _ = _build(spark, tmp_path)
    st = get_storage(out)
    v = st.current_version()
    orphan = st._manifest_path(v + 1)
    with open(orphan, "w") as f:
        json.dump({"stages": {}, "drop_dirs": [], "snapshot_id": v + 1}, f)
    # readers: unaffected (old snapshot current, all stages present)
    assert st.current_version() == v
    assert "lineage" in st.current_snapshot()["stages"]
    assert Searcher(spark, out).search(TermQuery("tiger"), 3).count() > 0
    # a new commit lands at v+2, not on top of the orphan
    snap = st._commit_snapshot(
        {"stages": st.current_snapshot()["stages"], "drop_dirs": []}
    )
    assert snap["snapshot_id"] == v + 2
    assert st.current_version() == v + 2


def test_compaction_is_single_atomic_flip(spark, tmp_path):
    """Before the flip: base+delta visible (old state). After compact_index
    returns: ONE new snapshot, deltas absorbed, doc counts exact. Torn
    cleanup (GC suppressed) is repaired by the next reader."""
    out, _ = _build(spark, tmp_path)
    extra = pages_spark_df(spark, 40, seed=10).withColumn(
        "url", F.concat(F.lit("g-"), F.col("url"))
    )
    append_index(spark, extra, out, CFG)
    total = Searcher(spark, out).docmap.count()

    # suppress the in-publish GC: simulates a crash right after the flip
    orig = SnapshotStorage.recover_pending_compaction
    SnapshotStorage.recover_pending_compaction = lambda self: False
    try:
        compact_index(spark, out, CFG)
        # stale delta dir still on disk (cleanup "crashed")...
        assert os.path.isdir(os.path.join(out, "deltas"))
    finally:
        SnapshotStorage.recover_pending_compaction = orig

    # ...but the next reader rolls the GC forward: no double counting
    s = Searcher(spark, out)
    assert s.docmap.count() == total
    assert get_storage(out).delta_dirs() == []
    assert not os.path.isdir(os.path.join(out, "deltas"))
    assert verify(spark, out)["ok"]


def test_compaction_applies_deletes_on_snapshot_backend(spark, tmp_path):
    out, _ = _build(spark, tmp_path)
    s = Searcher(spark, out)
    total = s.docmap.count()
    victims = [r.docid for r in s.docmap.limit(4).collect()]
    delete_docs(spark, out, victims)
    summary = compact_index(spark, out, CFG)
    assert summary["deletes_applied"] == 4
    s2 = Searcher(spark, out)
    assert s2.docmap.count() == total - 4
    assert not os.path.isdir(os.path.join(out, "tombstones"))
    assert verify(spark, out)["ok"]


def test_append_crash_before_lineage_invisible_then_resumes(spark, tmp_path):
    out, _ = _build(spark, tmp_path)
    base_count = Searcher(spark, out).docmap.count()
    extra = pages_spark_df(spark, 30, seed=11).withColumn(
        "url", F.concat(F.lit("h-"), F.col("url"))
    )

    orig = IndexBuilder._stage_lineage
    IndexBuilder._stage_lineage = lambda self: (_ for _ in ()).throw(
        RuntimeError("injected crash before final stage")
    )
    try:
        with pytest.raises(RuntimeError, match="injected"):
            append_index(spark, extra, out, CFG, batch_id="b1")
    finally:
        IndexBuilder._stage_lineage = orig

    # crashed generation: invisible to readers
    assert get_storage(out).delta_dirs() == []
    assert Searcher(spark, out).docmap.count() == base_count

    # SAME batch resumes: earlier stages skip, generation completes
    summary = append_index(spark, extra, out, CFG, batch_id="b1")
    assert summary["stages"]["partials"] == {"skipped": True}
    assert len(get_storage(out).delta_dirs()) == 1
    assert Searcher(spark, out).docmap.count() == base_count + extra.count()


def test_append_crashed_generation_not_reused_for_different_batch(spark, tmp_path):
    out, _ = _build(spark, tmp_path)
    a = pages_spark_df(spark, 30, seed=12).withColumn(
        "url", F.concat(F.lit("a-"), F.col("url"))
    )
    b = pages_spark_df(spark, 30, seed=13).withColumn(
        "url", F.concat(F.lit("b-"), F.col("url"))
    )
    orig = IndexBuilder._stage_lineage
    IndexBuilder._stage_lineage = lambda self: (_ for _ in ()).throw(
        RuntimeError("injected")
    )
    try:
        with pytest.raises(RuntimeError):
            append_index(spark, a, out, CFG, batch_id="batch-a")
    finally:
        IndexBuilder._stage_lineage = orig

    # different batch in the same generation slot: stages REBUILD (the
    # crashed batch's fingerprint never matches), contents are batch b's
    summary = append_index(spark, b, out, CFG, batch_id="batch-b")
    assert summary["stages"]["partials"] != {"skipped": True}
    s = Searcher(spark, out)
    urls = {r.url for r in s.docmap.select("url").collect()}
    assert any(u.startswith("b-") for u in urls)
    assert not any(u.startswith("a-") for u in urls)


def test_immutable_data_dirs_and_gc(spark, tmp_path):
    """A rebuilt stage gets a NEW data dir (old snapshot untouched until
    GC); gc_snapshots drops the unreferenced dir + old manifests."""
    out, pages = _build(spark, tmp_path)
    st = get_storage(out)
    old_dir = st.path("docmap")
    # force a docmap rebuild under a different fingerprint
    cfg2 = IndexConfig(num_partitions=4, bucket_width=2, flush_docs=32)
    build_index(spark, pages, out, cfg2)  # resume with new fp -> rewrites
    st2 = get_storage(out)
    assert st2.path("docmap") != old_dir
    assert os.path.isdir(old_dir)  # still readable (time travel until GC)
    removed = st2.gc_snapshots()
    assert removed > 0
    assert not os.path.isdir(old_dir)
    assert verify(spark, out)["ok"]


def test_append_and_delete_after_compaction_survive_gc(spark, tmp_path):
    """Regression: the compaction snapshot records drop_dirs for the
    absorbed deltas/ and applied tombstones/. Those entries must (a) name
    only the CHILDREN that existed at publish and (b) be CLEARED once
    GC'd — otherwise a post-compaction append or delete that recreates the
    same relative path (generation numbering restarts) is silently
    destroyed by the next reader's roll-forward."""
    out, pages = _build(spark, tmp_path, n=120)
    extra1 = pages_spark_df(spark, 40, seed=21, include_blake=False)
    append_index(spark, extra1, out, CFG)
    delete_docs(spark, out, [0])
    compact_index(spark, out, CFG)
    st = get_storage(out)
    assert isinstance(st, SnapshotStorage)
    # GC completed -> drop_dirs cleared from the current manifest
    assert st.current_snapshot().get("drop_dirs", []) == []
    from lucenenet_spark.query.ast import MatchAllDocsQuery

    n_compacted = Searcher(spark, out).count(MatchAllDocsQuery())

    # post-compaction delta generation + tombstone op recreate the same
    # relative paths the compaction dropped
    extra2 = pages_spark_df(spark, 30, seed=22, include_blake=False)
    append_index(spark, extra2, out, CFG)
    delete_docs(spark, out, [1])
    # a reader's roll-forward must NOT destroy them
    s = Searcher(spark, out)
    assert len(get_storage(out).delta_dirs()) == 1
    assert os.path.isdir(os.path.join(out, "tombstones"))
    assert s.tombstones is not None and s.tombstones.count() == 1
    # appended docs searchable, new tombstone honored
    assert s.count(MatchAllDocsQuery()) == n_compacted + 30 - 1


def test_roll_forward_does_not_clobber_concurrent_writer(tmp_path):
    """Regression: the reader-side roll-forward re-commits the manifest to
    clear drop_dirs; if a writer commit lands between the roll-forward's
    snapshot read and its clearing commit, the writer's stage entries must
    survive (CAS guard) — the drops stay pending and clear on the next
    quiet roll-forward."""
    import os

    from lucenenet_spark.index.snapshot_storage import SnapshotStorage

    root = str(tmp_path / "idx")
    st = SnapshotStorage(root)
    junk = os.path.join(root, "data", "junk", "0")
    os.makedirs(junk)
    st._commit_snapshot(
        {
            "stages": {"a": {"dir": "data/a/0", "meta": {"fingerprint": "f"}}},
            "drop_dirs": [os.path.join("data", "junk", "0")],
        }
    )
    orig = st.current_snapshot
    raced = {"done": False}

    def racy():
        s = orig()
        if not raced["done"]:
            raced["done"] = True
            # a writer lands AFTER the roll-forward read its snapshot
            w = SnapshotStorage(root)
            ws = w.current_snapshot()
            stages = dict(ws["stages"])
            stages["b"] = {"dir": "data/b/0", "meta": {"fingerprint": "g"}}
            w._commit_snapshot(
                {"stages": stages, "drop_dirs": ws.get("drop_dirs", [])}
            )
        return s

    st.current_snapshot = racy
    assert st.recover_pending_compaction()  # physical GC still happens
    assert not os.path.exists(junk)

    final = SnapshotStorage(root).current_snapshot()
    assert "b" in final["stages"], "writer commit was clobbered"
    assert final["drop_dirs"], "drops must stay pending on a lost race"
    # the next (quiet) roll-forward clears them; deletes are idempotent
    st2 = SnapshotStorage(root)
    st2.recover_pending_compaction()
    last = st2.current_snapshot()
    assert last["drop_dirs"] == [] and "b" in last["stages"]
