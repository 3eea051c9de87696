"""Snapshot commit/restore — reference tests/snapshot_test.cpp +
include/storage/snapshot_manager.hpp restore order (ID counters must
survive restart or fresh IDs collide)."""

import pytest

from tundradb_spark.database import Database
from tests.conftest import rows_set


@pytest.fixture()
def snap_path(tmp_path):
    return str(tmp_path / "db")


def test_commit_and_restore(spark, snap_path):
    db = Database(spark, path=snap_path)
    db.create_schema("User", {"name": "string", "age": "long"})
    db.create_schema("Co", {"name": "string"})
    db.create_node("User", name="a", age=1)
    db.create_node("User", name="b", age=2)
    db.create_node("Co", name="x")
    db.create_edge_schema("works", {"role": "string"})
    db.connect("works", ("User", 0), ("Co", 0), {"role": "eng"})
    db.commit()

    db2 = Database(spark, path=snap_path)
    assert rows_set(db2.get_table("User"), "id", "name", "age") == {
        (0, "a", 1),
        (1, "b", 2),
    }
    assert rows_set(db2.get_edge_table("works"), "source_id", "target_id", "role") == {
        (0, 0, "eng")
    }
    # ID counters restored → no collision (edge_store.hpp:124-143 bug class)
    assert db2.create_node("User", name="c", age=3) == 2
    ids = db2.connect("works", ("User", 1), ("Co", 0), {"role": "pm"})
    assert ids[0] >= 1


def test_multiple_snapshots_latest_wins(spark, snap_path):
    db = Database(spark, path=snap_path)
    db.create_schema("U", {"x": "long"})
    db.create_node("U", x=1)
    db.commit()
    db.create_node("U", x=2)
    db.commit()

    db2 = Database(spark, path=snap_path)
    assert db2.get_table("U").count() == 2


def test_uncommitted_changes_not_persisted(spark, snap_path):
    db = Database(spark, path=snap_path)
    db.create_schema("U", {"x": "long"})
    db.create_node("U", x=1)
    db.commit()
    db.create_node("U", x=2)  # not committed

    db2 = Database(spark, path=snap_path)
    assert db2.get_table("U").count() == 1


def test_versioned_snapshot_roundtrip(spark, snap_path):
    from tundradb_spark.temporal import MockClock

    clock = MockClock(1000)
    db = Database(spark, path=snap_path, versioning=True, clock=clock)
    db.create_schema("U", {"x": "long"})
    db.create_node("U", x=1)
    t_old = clock.advance(10)
    clock.advance(10)
    db.update_by_id("U", 0, {"x": 2})
    db.commit()

    db2 = Database(spark, path=snap_path)
    assert db2.versioning is True
    assert db2.get_table("U").collect()[0]["x"] == 2
    from tundradb_spark.query import Query

    df = db2.query(Query.from_("u:U").as_of_valid_time(t_old))
    assert rows_set(df, "u.x") == {(1,)}


def test_commit_without_path_raises(spark):
    from tundradb_spark.errors import QueryError

    db = Database(spark)
    with pytest.raises(QueryError):
        db.commit()


def test_incremental_commit_skips_clean_tables(spark, snap_path):
    # dirty-shard semantics (reference snapshot_manager.cpp): a table
    # untouched between commits is NOT re-serialized — the new manifest
    # re-points at the previous snapshot's parquet
    import json
    import os

    db = Database(spark, path=snap_path)
    db.create_schema("A", {"v": "long"})
    db.create_schema("B", {"v": "long"})
    db.create_node("A", v=1)
    db.create_node("B", v=2)
    db.commit()
    db.update_by_id("A", 0, {"v": 10})  # only A is dirty now
    db.commit()

    with open(os.path.join(snap_path, "snapshots", "1", "manifest.json")) as f:
        m = json.load(f)
    assert m["nodes"]["A"].startswith("snapshots/1/")
    assert m["nodes"]["B"].startswith("snapshots/0/")  # carried over
    assert not os.path.exists(
        os.path.join(snap_path, "snapshots", "1", "nodes", "B")
    )

    # restore reads the stitched snapshot correctly
    db2 = Database(spark, path=snap_path)
    assert rows_set(db2.get_table("A"), "id", "v") == {(0, 10)}
    assert rows_set(db2.get_table("B"), "id", "v") == {(0, 2)}
    # and a third commit with nothing dirty re-points everything
    db2.commit()
    with open(os.path.join(snap_path, "snapshots", "2", "manifest.json")) as f:
        m2 = json.load(f)
    assert m2["nodes"]["A"].startswith("snapshots/1/")
    assert m2["nodes"]["B"].startswith("snapshots/0/")


def test_noop_dml_does_not_dirty(spark, snap_path):
    # a zero-effect mutation must not force the incremental COMMIT to
    # re-serialize the table (review finding: dirty=True on no-op DML)
    import json
    import os

    from tundradb_spark.errors import QueryError

    db = Database(spark, path=snap_path)
    db.create_schema("A", {"v": "long"})
    db.create_node("A", v=1)
    db.commit()  # snapshot 0

    missing = spark.createDataFrame([(999,)], "id long")
    assert db.update_nodes("A", missing, {"v": 2}) == 0
    assert db.delete_nodes("A", missing) == 0
    with pytest.raises(QueryError):
        db.update_by_id("A", 999, {"v": 3})  # not-found: no side effects
    assert rows_set(db.get_table("A"), "id", "v") == {(0, 1)}

    db.commit()  # snapshot 1: nothing dirty -> everything carried over
    with open(os.path.join(snap_path, "snapshots", "1", "manifest.json")) as f:
        m = json.load(f)
    assert m["nodes"]["A"].startswith("snapshots/0/")


def test_gc_preserves_shared_incremental_files(spark, snap_path):
    import os

    db = Database(spark, path=snap_path)
    db.create_schema("A", {"v": "long"})
    db.create_schema("B", {"v": "long"})
    db.create_node("A", v=1)
    db.create_node("B", v=2)
    db.commit()  # snapshot 0: A + B written
    db.update_by_id("A", 0, {"v": 10})
    db.commit()  # snapshot 1: A rewritten, B carried from snapshot 0

    removed = db.gc_snapshots(keep_last=1)
    # snapshot 0 still holds B's only copy — must survive, A's old dir goes
    assert removed == []
    assert os.path.isdir(os.path.join(snap_path, "snapshots", "0", "nodes", "B"))
    assert not os.path.isdir(
        os.path.join(snap_path, "snapshots", "0", "nodes", "A")
    )

    # restore of the kept snapshot still reads the stitched state
    db2 = Database(spark, path=snap_path)
    assert rows_set(db2.get_table("A"), "id", "v") == {(0, 10)}
    assert rows_set(db2.get_table("B"), "id", "v") == {(0, 2)}


def test_gc_removes_fully_unreferenced_and_crashed(spark, snap_path):
    import os

    db = Database(spark, path=snap_path)
    db.create_schema("A", {"v": "long"})
    db.create_node("A", v=1)
    db.commit()  # snapshot 0
    db.update_by_id("A", 0, {"v": 2})
    db.commit()  # snapshot 1 (A rewritten -> snapshot 0 unreferenced)
    # crashed partial commit: dir exists, LATEST never flipped
    os.makedirs(os.path.join(snap_path, "snapshots", "7", "nodes", "A"))

    removed = db.gc_snapshots(keep_last=1)
    assert set(removed) == {0, 7}
    assert not os.path.isdir(os.path.join(snap_path, "snapshots", "0"))
    assert not os.path.isdir(os.path.join(snap_path, "snapshots", "7"))

    db2 = Database(spark, path=snap_path)
    assert rows_set(db2.get_table("A"), "id", "v") == {(0, 2)}


def test_gc_rejects_keep_last_below_one(spark, snap_path):
    # keep_last=0 would collect the snapshot LATEST points at and leave the
    # database unrestorable — validated before anything is touched
    import os

    import pytest

    db = Database(spark, path=snap_path)
    db.create_schema("A", {"v": "long"})
    db.create_node("A", v=1)
    db.commit()
    for bad in (0, -3):
        with pytest.raises(ValueError, match="keep_last"):
            db.gc_snapshots(keep_last=bad)
    assert os.path.isdir(os.path.join(snap_path, "snapshots", "0"))


def test_variant_table_survives_commit_restore(spark, snap_path):
    # r7: a VARIANT property column (the dense_union map realization)
    # must round-trip through snapshot parquet with its per-row runtime
    # types intact — typed WHERE access works identically after restore
    from pyspark.sql import functions as F

    from tundradb_spark import Query

    ev = spark.createDataFrame(
        [(1, '{"k": 69}'), (2, '{"k": "high"}'), (3, '{"k": 99}')],
        "id long, j string",
    ).select("id", F.parse_json("j").alias("props"))
    db = Database(spark, path=snap_path)
    db.register_node_table("ev", ev, "id", resume_counter=False)
    db.commit()

    db2 = Database(spark, path=snap_path)
    assert db2.get_table("ev").schema["props"].dataType.typeName() == "variant"
    got = db2.query(
        Query.from_("e:ev").where("e.props.k", ">", 50).select("e.id AS id")
    )
    assert sorted(r["id"] for r in got.collect()) == [1, 3]
