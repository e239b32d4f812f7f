from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from darc_spark.sources.store import SnapshotStore

SCHEMA = T.StructType([T.StructField("k", T.StringType()), T.StructField("v", T.LongType())])


@pytest.fixture()
def store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "store"), schemas={"t": SCHEMA})


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_empty_read_has_schema(store):
    df = store.read("t")
    assert df.count() == 0
    assert df.schema == SCHEMA


def test_append_invisible_until_commit(spark, store):
    store.append("t", _df(spark, [("a", 1)]))
    assert store.read("t").count() == 0
    store.commit({"round": 1})
    assert store.read("t").count() == 1


def test_multi_append_and_replace(spark, store):
    store.append("t", _df(spark, [("a", 1)]))
    store.append("t", _df(spark, [("b", 2)]))
    store.commit()
    assert store.read("t").count() == 2
    store.replace("t", _df(spark, [("c", 3)]))
    store.commit()
    rows = store.read("t").collect()
    assert [(r.k, r.v) for r in rows] == [("c", 3)]


def test_rollback_discards_staged(spark, store):
    store.append("t", _df(spark, [("a", 1)]))
    store.rollback()
    store.commit()
    assert store.read("t").count() == 0


def test_resume_from_latest_manifest(spark, store, tmp_path):
    store.append("t", _df(spark, [("a", 1)]))
    v1 = store.commit({"round": 1})
    store.append("t", _df(spark, [("b", 2)]))
    v2 = store.commit({"round": 2})
    # simulate a new process resuming
    resumed = SnapshotStore(store.spark, store.root, schemas={"t": SCHEMA})
    assert resumed.version == v2 == v1 + 1
    assert resumed.read("t").count() == 2
    assert resumed.latest_meta() == {"round": 2}


def test_kill_midwrite_resumes_previous(spark, store):
    """Orphan (uncommitted) segments are invisible after 'crash'."""
    store.append("t", _df(spark, [("a", 1)]))
    store.commit({"round": 1})
    # deferred append, crash before commit → never materialized, no orphan
    store.append("t", _df(spark, [("junk", 9)]))
    # eager append, crash before commit → orphan dir exists on disk
    store.append("t", _df(spark, [("junk2", 8)]), defer=False)
    resumed = SnapshotStore(store.spark, store.root, schemas={"t": SCHEMA})
    assert [(r.k, r.v) for r in resumed.read("t").collect()] == [("a", 1)]
    assert resumed.gc() == 1  # only the eager orphan needed cleaning


def test_torn_manifest_ignored(spark, store):
    store.append("t", _df(spark, [("a", 1)]))
    store.commit({"round": 1})
    # a torn/corrupt newer manifest must not win
    with open(os.path.join(store.root, "_manifests", "v000099.json"), "w") as f:
        f.write('{"version": 99, "tab')
    resumed = SnapshotStore(store.spark, store.root, schemas={"t": SCHEMA})
    assert resumed.version == 1
    assert resumed.read("t").count() == 1
