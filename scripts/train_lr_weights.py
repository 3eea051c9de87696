"""Regenerate the frozen LR quality-filter weight table embedded in
__spark_entry__.py (LR_WEIGHTS).

The driver rows score with FROZEN weights (the DSIR literal precedent —
training is IRLS with a driver-side solve, not SQL-expressible); this
script re-runs the deterministic trainer and prints the literal block.
Training is a pure function of the data (beta_0 = 0, fixed iteration
count, decimal-exact moment sums), so re-running on the same parquet
reproduces the table byte-for-byte.

Usage: PYTHONPATH=. python scripts/train_lr_weights.py [sf_dir]
"""

import sys

from pyspark.sql import SparkSession, functions as F

from tundradb_spark.pipeline.classify import lr_train, lr_weight_literals

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
    "doc_id", "text", F.expr("cast(lang = 'en' as int)").alias("label")
)
w = lr_train(docs, n_buckets=256, n_iter=4, ridge=1.0)
rows = sorted((r["bucket"], r["weight"]) for r in w.collect())
print("LR_WEIGHTS = [")
for b, s in lr_weight_literals(rows):
    print(f'    ({b}, "{s}"),')
print("]")
spark.stop()
