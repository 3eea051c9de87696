"""Bitemporal versioning parity — reference tests/temporal_query_test.cpp
(AS-OF valid/tx/bitemporal reads, version chains under MockClock,
before-creation invisibility, no-op updates) and
docs/README_temporal_versioning.md:78-100 visibility rules."""

import pytest

from tundradb_spark.database import Database
from tundradb_spark.query import Query
from tundradb_spark.temporal import MockClock
from tests.conftest import rows_set


@pytest.fixture()
def tdb(spark):
    clock = MockClock(start=1000)
    db = Database(spark, versioning=True, clock=clock)
    db.clock_handle = clock
    return db


def test_version_chain_and_as_of(tdb):
    db = tdb
    db.create_schema("User", {"name": "string", "age": "long"})
    db.create_node("User", name="alice", age=25)  # t≈1001
    t_created = db.clock_handle.advance(100)  # 1101
    db.update_by_id("User", 0, {"age": 30})  # t≈1102
    t_after_first = db.clock_handle.advance(100)  # 1202
    db.update_by_id("User", 0, {"age": 35})  # t≈1203

    # current read sees the newest version
    assert db.get_table("User").collect()[0]["age"] == 35
    # AS-OF before the first update
    df = db.query(Query.from_("u:User").as_of_valid_time(t_created))
    assert rows_set(df, "u.age") == {(25,)}
    # AS-OF between the updates
    df = db.query(Query.from_("u:User").as_of_valid_time(t_after_first))
    assert rows_set(df, "u.age") == {(30,)}
    # version chain has 3 versions
    assert db.get_table_versions("User").count() == 3


def test_before_creation_invisible(tdb):
    db = tdb
    db.create_schema("User", {"name": "string", "age": "long"})
    t_before = db.clock_handle.advance(1)
    db.clock_handle.advance(100)
    db.create_node("User", name="alice", age=25)
    assert db.query(Query.from_("u:User").as_of_valid_time(t_before)).count() == 0
    assert db.get_table("User").count() == 1


def test_noop_update_creates_no_version(tdb):
    # temporal_query_test.cpp:823 NoOpUpdate
    db = tdb
    db.create_schema("User", {"name": "string", "age": "long"})
    db.create_node("User", name="alice", age=25)
    n = db.update_by_id("User", 0, {"age": 25})
    assert n == 0
    assert db.get_table_versions("User").count() == 1


def test_tx_time_travel(tdb):
    db = tdb
    db.create_schema("User", {"name": "string", "age": "long"})
    db.create_node("User", name="alice", age=25)
    t_tx = db.clock_handle.advance(50)
    db.update_by_id("User", 0, {"age": 99})
    # as-of transaction time before the update: the old version was current
    df = db.query(Query.from_("u:User").as_of_tx_time(t_tx))
    assert rows_set(df, "u.age") == {(25,)}
    # bitemporal: both axes pinned
    df = db.query(Query.from_("u:User").as_of(t_tx, t_tx))
    assert rows_set(df, "u.age") == {(25,)}


def test_versioned_delete_is_logical(tdb):
    db = tdb
    db.create_schema("User", {"name": "string", "age": "long"})
    db.create_node("User", name="alice", age=25)
    t_alive = db.clock_handle.advance(10)
    db.clock_handle.advance(10)
    db.delete_node("User", 0)
    assert db.get_table("User").count() == 0  # gone now
    df = db.query(Query.from_("u:User").as_of_valid_time(t_alive))
    assert df.count() == 1  # still visible in the past


def test_match_respects_temporal_context(tdb):
    # temporal context flows through traversals (query_bootstrap.cpp:10-17)
    db = tdb
    db.create_schema("User", {"name": "string", "age": "long"})
    db.create_schema("Co", {"name": "string"})
    db.create_node("User", name="a", age=1)
    db.create_node("Co", name="x")
    db.connect("works", ("User", 0), ("Co", 0))
    t_old = db.clock_handle.advance(10)
    db.clock_handle.advance(10)
    db.update_by_id("Co", 0, {"name": "y"})
    q = (
        Query.from_("u:User")
        .traverse("u", "works", "c:Co", "inner")
        .as_of_valid_time(t_old)
    )
    assert rows_set(db.query(q), "c.name") == {("x",)}


def test_update_by_match_versioned_counts_only_changed(tdb):
    db = tdb
    db.create_schema("User", {"name": "string", "age": "long"})
    db.create_node("User", name="a", age=10)
    db.create_node("User", name="b", age=20)
    db.create_node("User", name="c", age=20)
    # no-op for b and c? no: set age=20 → only a changes
    q = Query.from_("u:User")
    counts = db.update_by_match(q, {"u.age": 20})
    assert counts == {"u": 1}
    assert db.get_table_versions("User").count() == 4  # 3 creates + 1 version


def test_nonversioned_db_has_no_version_columns(spark):
    db = Database(spark, versioning=False)
    db.create_schema("U", {"x": "long"})
    db.create_node("U", x=1)
    assert db.get_table("U").columns == ["id", "x"]
