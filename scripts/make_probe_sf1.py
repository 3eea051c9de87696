#!/usr/bin/env python3
"""Build a deterministic sf1 probe replica (10x sf0.1) under
``.probe/sf1`` — for SCALE PROBES ONLY, never for correctness runs.

The driver testdata tops out at sf0.1, and the sf0.01 base is
overhead-dominated enough to hide super-linearity (r6 verdict item 8);
this gives the decade probe a 6M-row-lineitem base without touching the
read-only /root/testdata.

Construction (seedless, pure SQL over the sf0.1 parquet — rerunning
byte-reproduces it):

* ``region``/``nation`` are copied verbatim — TPC-H dimension tables are
  fixed-size at every scale factor.
* Every other table is 10 replicas with primary/foreign keys shifted by
  ``rep * 10_000_000`` consistently (orders.o_custkey moves with
  customer.c_custkey, lineitem moves with orders/part/supplier), so
  joins behave exactly as at sf0.1, just 10x wider.
* ``documents``: every TOKEN gets a per-replica suffix (``r1``..``r9``;
  replica 0 verbatim).  Within-replica duplicate structure (exact dups,
  shared boilerplate segments) is preserved exactly; cross-replica token
  matches are impossible.  This is the honest growth model — a 10x
  corpus with the SAME duplication rate — where naive text replication
  would make every document 10x-duplicated and every segment shared,
  inflating dedup output super-linearly by construction.
* ``embeddings``: vec_id shifted; vectors verbatim.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".probe",
    "sf1",
)
REPS = 10
SHIFT = 10_000_000

#: table -> list of key columns shifted by rep*SHIFT (None = copy verbatim)
SHIFTED: dict[str, list[str] | None] = {
    "region": None,
    "nation": None,
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    # user_id moves with the customer key space: per-user series stay
    # sf0.1-length (10x USERS, not 10x-deeper partitions) and replica
    # orders still find their replica's events
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
}


def build(dst: str = DST, src: str = SRC, reps: int = REPS) -> str:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, keys in SHIFTED.items():
        out = os.path.join(dst, f"{table}.parquet")
        if os.path.exists(out):
            continue
        base = f"SELECT * FROM '{src}/{table}.parquet'"
        if keys is None:
            sql = base
        else:
            cols = [
                r[0]
                for r in con.execute(f"DESCRIBE {base}").fetchall()
            ]
            parts = []
            for rep in range(reps):
                sel = []
                for c in cols:
                    if c in keys:
                        sel.append(f"{c} + {rep * SHIFT} AS {c}")
                    elif table == "documents" and c == "text" and rep:
                        # suffix EVERY token: within-replica duplicate
                        # structure intact, zero cross-replica matches
                        sel.append(
                            f"regexp_replace(text, '(\\S+)', "
                            f"'\\1r{rep}', 'g') AS text"
                        )
                    elif table == "documents" and c == "n_chars" and rep:
                        # keep the size column consistent with the
                        # suffixed text (weights/reports read n_chars)
                        sel.append(
                            f"length(regexp_replace(text, '(\\S+)', "
                            f"'\\1r{rep}', 'g')) AS n_chars"
                        )
                    else:
                        sel.append(c)
                parts.append(
                    f"SELECT {', '.join(sel)} FROM "
                    f"'{src}/{table}.parquet'"
                )
            sql = " UNION ALL ".join(parts)
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table:<12} {n:>9} rows -> {out}")
    con.close()
    return dst


if __name__ == "__main__":
    build(*(sys.argv[1:2] or [DST]))
