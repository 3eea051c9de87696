"""JSONL corpus source/sink (sources/jsonl.py) — the LLM-pipeline
interchange format; capability extension beyond the reference's CSV-only
text ingest (bench/tundra_runner.cpp:33-70)."""

import json

import pytest

from tundradb_spark.database import Database
from tundradb_spark.query import Query
from tundradb_spark.sources.jsonl import (
    load_jsonl_docs,
    read_jsonl,
    write_jsonl,
)


@pytest.fixture()
def corpus_path(tmp_path):
    docs = [
        {"doc_id": 0, "text": "hello corpus world", "lang": "en",
         "source": "web", "n_chars": 18, "extra_key": "dropped"},
        {"doc_id": 1, "text": "ein kleiner text", "lang": "de",
         "source": "web", "n_chars": 99},  # wrong n_chars on purpose
        {"doc_id": 2, "text": "", "lang": "en", "source": "book",
         "n_chars": 0},
    ]
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in docs) + "\n")
    return str(p)


def test_read_schema_enforced_and_extras_dropped(spark, corpus_path):
    df = read_jsonl(spark, corpus_path)
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.count() == 3
    assert dict(df.dtypes)["doc_id"] == "bigint"


def test_load_into_engine_and_query(spark, corpus_path):
    db = Database(spark)
    n = load_jsonl_docs(db, "doc", corpus_path, derive_n_chars=True)
    assert n == 3
    # counter resumed past the file's max id
    assert db.create_node(
        "doc", text="new", lang="en", source="api", n_chars=3
    ) == 3
    rows = {
        r["c"]: r["n"]
        for r in db.query(
            Query.from_("d:doc")
            .where("d.lang", "=", "en")
            .select("d.id AS c", "d.n_chars AS n")
        ).collect()
    }
    # n_chars derived from text, not trusted from the file
    assert rows == {0: 18, 2: 0, 3: 3}


def test_round_trip_write_read(spark, corpus_path, tmp_path):
    out = str(tmp_path / "out_jsonl")
    df = read_jsonl(spark, corpus_path)
    write_jsonl(df, out)
    back = read_jsonl(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_failfast_rejects_malformed(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"doc_id": 0, "text": "ok"}\nnot-json-at-all\n')
    with pytest.raises(Exception):
        read_jsonl(spark, str(p), mode="FAILFAST").collect()
