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
