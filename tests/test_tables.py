"""SnapshotStore: append/commit/read_at/resume round-trips + lineage."""

from __future__ import annotations

import json
import os

from simplecrawler_spark.plans import schemas
from simplecrawler_spark.plans.tables import SnapshotStore


def _store(spark, root):
    return SnapshotStore(spark, str(root), schemas={
        "seen": schemas.SEEN, "frontier": schemas.FRONTIER})


def test_append_read_commit(spark, tmp_path):
    st = _store(spark, tmp_path)
    assert st.read("seen").count() == 0  # empty table via schema registry
    df = spark.createDataFrame([(1, "http://a/", 0, 0)], schemas.SEEN)
    st.append("seen", df)
    assert st.read("seen").count() == 1  # pending visible
    st.commit_snapshot(0, {"new": 1})
    st.append("seen", spark.createDataFrame([(2, "http://b/", 0, 1)], schemas.SEEN))
    st.commit_snapshot(1, {"new": 1})
    assert st.read("seen").count() == 2
    assert st.read_at("seen", 1).count() == 1  # time travel


def test_resume_from_manifest(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.append("seen", spark.createDataFrame([(1, "http://a/", 0, 0)], schemas.SEEN))
    st.commit_snapshot(3, {})
    # uncommitted appends are lost on crash — simulate one
    st.append("seen", spark.createDataFrame([(9, "http://z/", 0, 9)], schemas.SEEN))

    resumed = _store(spark, tmp_path)  # fresh open, same root
    assert resumed.latest_round() == 3
    assert resumed.read("seen").count() == 1  # uncommitted append excluded


def test_lineage_rowcounts(spark, tmp_path):
    st = _store(spark, tmp_path)
    df = spark.createDataFrame(
        [(i, f"http://h/{i}", 0, 0) for i in range(10)], schemas.SEEN)
    st.append("seen", df)
    manifest = st.commit_snapshot(0, {"fetched": 10.0})
    snap = json.load(open(manifest))
    rows = sum(f["rows"] for a in snap["new_lineage"]["seen"] for f in a["files"])
    assert rows == 10
    assert snap["metrics"] == {"fetched": 10.0}
    assert os.path.basename(manifest) == "snap-000001.json"


def test_expire_and_vacuum(spark, tmp_path):
    """Iceberg-style maintenance: expire drops old manifests (current
    state + resume intact), vacuum then removes every data dir no
    retained manifest references — overwrite leftovers and crashed
    appends included — while pending appends survive."""
    import glob
    import os

    import pytest

    st = _store(spark, tmp_path)
    for i in range(4):
        st.append("seen", spark.createDataFrame(
            [(i, f"http://a/{i}", 0, i)], schemas.SEEN))
        st.commit_snapshot(i, {})
    # overwrite repoints 'seen' at one fresh dir → 4 orphans-to-be
    st.overwrite("seen", st.read("seen"))
    st.commit_snapshot(4, {})
    # a crashed append: dir on disk, never committed, not pending
    # (fresh store instance below forgets it)
    st.append("seen", spark.createDataFrame(
        [(99, "http://z/", 0, 9)], schemas.SEEN))

    st2 = _store(spark, tmp_path)       # reopen: pending forgotten
    n_before = st2.read("seen").count()
    assert n_before == 4
    dropped = st2.expire_snapshots(keep_last=1)
    assert len(dropped) == 4            # snaps 1-4 gone; 5 kept
    with pytest.raises(FileNotFoundError):
        st2.read_at("seen", 1)
    # a pending append right now must NOT be vacuumed
    st2.append("seen", spark.createDataFrame(
        [(100, "http://p/", 0, 1)], schemas.SEEN))
    removed = st2.vacuum()
    # gone: the 4 pre-overwrite append dirs + the crashed append
    assert len(removed) == 5
    data_dirs = glob.glob(os.path.join(str(tmp_path),
                                       "data", "seen", "*"))
    # survivors: the overwrite dir (snap 5) + the pending dir
    assert len(data_dirs) == 2
    assert st2.read("seen").count() == n_before + 1
    # resume after maintenance still works
    st3 = _store(spark, tmp_path)
    assert st3.read("seen").count() == n_before
    assert st3.latest_round() == 4
