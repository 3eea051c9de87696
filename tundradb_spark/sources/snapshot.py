"""Snapshot commit/restore: versioned Parquet directories + JSON manifest.

Reference behavior (include/storage/snapshot_manager.hpp:18-99,
src/storage/snapshot_manager.cpp): COMMIT writes dirty shards + edges to
Parquet plus metadata/manifest JSON; startup restores the latest snapshot in
the order metadata → schemas → manifest (**ID counters!**) → shards → edge
schemas → edges. Losing the counters would make fresh IDs collide with
restored rows — the manifest carries them (same bug class the reference
guards at include/core/edge_store.hpp:124-143).

Spark realization: immutable writes make dirty-tracking/compaction
unnecessary; each snapshot is a self-contained directory
``{path}/snapshots/{n}/`` with one parquet dataset per node schema / edge
type and a ``manifest.json``. ``{path}/LATEST`` points at the newest
snapshot (written last, so a crashed commit is simply invisible).
"""

from __future__ import annotations

import json
import os
import time
from typing import TYPE_CHECKING

from tundradb_spark.catalog import Catalog
from tundradb_spark.database import _Table

if TYPE_CHECKING:
    from tundradb_spark.database import Database

MANIFEST = "manifest.json"
LATEST = "LATEST"


def commit_snapshot(db: "Database") -> str:
    root = db.path
    os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
    prev = _latest_id(root)
    snap_id = (prev if prev is not None else -1) + 1
    snap_dir = os.path.join(root, "snapshots", str(snap_id))

    node_paths: dict[str, str] = {}
    for name in db.catalog.node_schemas:
        df = db.get_table_versions(name) if db.versioning else db.get_table(name)
        rel = f"nodes/{name}"
        df.write.mode("overwrite").parquet(os.path.join(snap_dir, rel))
        node_paths[name] = rel
    edge_paths: dict[str, str] = {}
    for etype in db._edges:
        rel = f"edges/{etype}"
        db.get_edge_table(etype).write.mode("overwrite").parquet(
            os.path.join(snap_dir, rel)
        )
        edge_paths[etype] = rel

    manifest = {
        "snapshot_id": snap_id,
        "created_ms": int(time.time() * 1000),
        "versioning": db.versioning,
        "catalog": db.catalog.to_manifest(),
        "nodes": node_paths,
        "edges": edge_paths,
    }
    with open(os.path.join(snap_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    # atomic-ish pointer flip, written last
    tmp = os.path.join(root, LATEST + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(snap_id))
    os.replace(tmp, os.path.join(root, LATEST))
    return snap_dir


def _latest_id(root: str) -> int | None:
    p = os.path.join(root, LATEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def try_restore(db: "Database") -> bool:
    """Restore the latest snapshot if one exists (reference
    SnapshotManager::initialize order: schemas → counters → tables)."""
    root = db.path
    snap_id = _latest_id(root)
    if snap_id is None:
        return False
    snap_dir = os.path.join(root, "snapshots", str(snap_id))
    with open(os.path.join(snap_dir, MANIFEST)) as f:
        manifest = json.load(f)

    db.catalog = Catalog.from_manifest(manifest["catalog"])
    db.versioning = manifest.get("versioning", False)
    db._nodes = {}
    db._edges = {}
    for name, rel in manifest["nodes"].items():
        schema = db.catalog.get_node_schema(name)
        df = db.spark.read.parquet(os.path.join(snap_dir, rel))
        db._nodes[name] = _Table(
            struct=schema.struct, frame=df, versioned=db.versioning
        )
    for etype, rel in manifest["edges"].items():
        es = db.catalog.get_or_create_edge_schema(etype)
        df = db.spark.read.parquet(os.path.join(snap_dir, rel))
        db._edges[etype] = _Table(struct=es.full_struct(), frame=df)
    return True
