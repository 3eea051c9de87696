"""r12 decade probe (r11 verdict item 7): the two r11 streaming twins'
STATE GROWTH and reader cost at sf1 epoch counts — the batch operators
(distribution_drift, value_trend) were probed in r11; this measures the
twins: per-epoch state is groups x cells regardless of stream volume,
merged-state reads are constant-cost, and stream == batch holds at sf1.

Usage: PYTHONPATH=. python scripts/probe_r12_twins.py [sf_dir] [n_epochs]
"""

import glob
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1"
N_EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
BOUNDS, BINS, EPOCH_US = (0.0, 1000.0), 10, 1_704_067_200_000_000

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from tundradb_spark.operators.analytics import (  # noqa: E402
    distribution_drift, value_trend,
)
from tundradb_spark.streaming import (  # noqa: E402
    read_drift, read_trend, stream_drift_bins, stream_trend_moments,
)

work = tempfile.mkdtemp(prefix="twinprobe-")
src = os.path.join(work, "src")
ev = spark.read.parquet(f"{SF}/events.parquet")
n_rows = ev.count()
# N_EPOCHS files -> N_EPOCHS micro-batches via maxFilesPerTrigger=1
ev.repartition(N_EPOCHS).write.parquet(src)
schema = ev.schema


def du(path: str) -> int:
    return sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                           recursive=True)
    )


def run(tag, start_fn, read_fn, batch_fn):
    sink = os.path.join(work, f"{tag}-sink")
    ckpt = os.path.join(work, f"{tag}-ckpt")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = start_fn(stream, sink, ckpt)
    t0 = time.time()
    q.processAllAvailable()
    ingest = time.time() - t0
    q.stop()
    state = spark.read.parquet(sink)
    n_state = state.count()
    epochs = state.select("epoch").distinct().count()
    t0 = time.time()
    got = sorted(map(tuple, read_fn(sink).collect()))
    read_s = time.time() - t0
    t0 = time.time()
    want = sorted(map(tuple, batch_fn().collect()))
    batch_s = time.time() - t0
    print(
        f"[{tag}] rows={n_rows:,} epochs={epochs} ingest={ingest:6.1f}s"
        f" state_rows={n_state} ({n_state / max(epochs, 1):.0f}/epoch)"
        f" state_bytes={du(sink):,}"
        f" read={read_s:5.2f}s batch={batch_s:5.2f}s"
        f" stream==batch: {got == want}"
    )
    assert got == want, f"{tag}: stream-merged != batch"


ref = ev.filter("event_id % 2 = 0")
run(
    "drift_bins",
    lambda s, sink, ck: stream_drift_bins(s, sink, ck, BOUNDS, BINS),
    lambda sink: read_drift(spark, sink, ref, BOUNDS, BINS, min_n=100),
    lambda: distribution_drift(ref, ev, bounds=BOUNDS, n_bins=BINS,
                               min_n=100),
)
run(
    "trend_moments",
    lambda s, sink, ck: stream_trend_moments(s, sink, ck, EPOCH_US),
    lambda sink: read_trend(spark, sink, min_n=100),
    lambda: value_trend(ev, epoch_us=EPOCH_US, min_n=100),
)
shutil.rmtree(work, ignore_errors=True)
spark.stop()
