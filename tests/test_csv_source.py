"""S9 CSV source: the reference bench runner's bootstrap shape
(bench/tundra_runner.cpp:33-70,149) — users/companies + works_at CSVs loaded
into the engine, then MATCHed."""

import pytest

from tests.conftest import rows_set
from tundradb_spark.database import Database
from tundradb_spark.query import Query
from tundradb_spark.sources.csv import load_csv_edges, load_csv_nodes


@pytest.fixture()
def csv_dir(tmp_path):
    (tmp_path / "users.csv").write_text(
        "id,name,age\n0,Alice,25\n1,Bob,31\n2,Cara,40\n"
    )
    (tmp_path / "companies.csv").write_text("name\nAcme\nGlobex\n")
    (tmp_path / "works_at.csv").write_text(
        "source_id,target_id,since\n0,0,2019\n1,0,2021\n2,1,2018\n"
    )
    return tmp_path


def test_csv_graph_roundtrip(spark, csv_dir):
    db = Database(spark)
    # id column present → zero-copy registration, counter resumes past max
    n_users = load_csv_nodes(db, "user", str(csv_dir / "users.csv"))
    assert n_users == 3
    assert db.create_node("user", name="Dan", age=19) == 3  # resumed counter

    # no id column → engine-contiguous ids via bulk_insert (schema inferred)
    n_comp = load_csv_nodes(
        db, "company", str(csv_dir / "companies.csv"), id_col=None
    )
    assert n_comp == 2
    assert rows_set(db.get_table("company"), "id", "name") == {
        (0, "Acme"),
        (1, "Globex"),
    }

    db.create_edge_schema("WORKS_AT", {"since": "long"})
    n_edges = load_csv_edges(db, "WORKS_AT", str(csv_dir / "works_at.csv"))
    assert n_edges == 3

    res = db.query(
        Query.from_("u:user")
        .traverse("u", "w:WORKS_AT", "c:company", "inner")
        .where("w.since", ">=", 2019)
        .select("u.name AS uname", "c.name AS cname", "w.since AS since")
    )
    assert rows_set(res, "uname", "cname", "since") == {
        ("Alice", "Acme", 2019),
        ("Bob", "Acme", 2021),
    }


def test_csv_explicit_schema_skips_inference(spark, csv_dir):
    db = Database(spark)
    n = load_csv_nodes(
        db,
        "user",
        str(csv_dir / "users.csv"),
        schema="id long, name string, age long",
    )
    assert n == 3
    assert [f.simpleString() for f in db.get_table("user").schema.fields] == [
        "id:bigint",
        "name:string",
        "age:bigint",
    ]
