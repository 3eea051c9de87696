"""JSONL corpus source/sink — the LLM-pipeline interchange format.

The reference's only text source is CSV (bench/tundra_runner.cpp:33-70);
training corpora ship as JSON-lines (one document object per line, usually
gzip-compressed).  Capability extension, Spark-first: ``spark.read.json``
parses distributed (per-line, splittable even inside multi-file globs; use
uncompressed or zstd/bzip2 for splittable compression at 100 TB — a single
giant .gz file parses on one task), and documents land through the same
bulk ingest paths every other source uses.

Schema discipline: inference costs an extra full pass AND can mistype
sparse fields (a column that is null for the first million lines), so
``load_jsonl_docs`` defaults to the standard corpus schema and accepts a
DDL override.  Unknown keys are dropped by the explicit schema — corpus
files routinely carry per-provenance extras; keep what the pipeline needs.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession, functions as F

if TYPE_CHECKING:  # pragma: no cover
    from tundradb_spark.database import Database

#: the pipeline's standard document schema (matches testdata documents)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = DOC_SCHEMA,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read a JSONL file/glob with an explicit schema (None = infer,
    costing one extra pass).  ``mode='FAILFAST'`` raises on malformed
    lines instead of nulling them."""
    reader = spark.read.option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write a corpus frame as JSON-lines (one object per row).  Pass
    ``compression='gzip'``/... only for archival — splittable codecs or
    none for data that Spark will read back."""
    writer = df.write.mode("overwrite")
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)


def load_jsonl_docs(
    db: "Database",
    schema_name: str,
    path: str,
    id_col: str | None = "doc_id",
    schema: str | None = DOC_SCHEMA,
    derive_n_chars: bool = False,
) -> int:
    """Load a JSONL corpus into node schema ``schema_name`` through the
    bulk ingest paths (register zero-copy when the file carries ids;
    engine-assigned contiguous ids otherwise) — ONE pass over the data
    with an explicit schema.  ``derive_n_chars=True`` recomputes
    ``n_chars`` from ``text`` (files in the wild disagree with their own
    metadata; deriving makes the column trustworthy)."""
    df = read_jsonl(db.spark, path, schema)
    if derive_n_chars and "text" in df.columns:
        df = df.withColumn("n_chars", F.length("text").cast("long"))
    if id_col is not None and id_col in df.columns:
        return db.register_node_table(schema_name, df, id_col=id_col)
    if schema_name not in db.catalog.node_schemas:
        db.create_schema(
            schema_name,
            {f.name: f.dataType.simpleString() for f in df.schema.fields},
        )
    return db.bulk_insert(schema_name, df)
