"""tundra-shell: interactive REPL / script runner for TundraQL.

Usage:
    python -m tundradb_spark.ql.shell [--db PATH] [--script FILE] [--cpus N]

Replicates the reference shell's modes (apps/tundra_shell.cpp:1860-2051):
interactive REPL (statement per line, ``;``-terminated, multi-line
continuation) and ``--script`` batch execution; results print as ASCII
tables via ``DataFrame.show`` (the reference's printTableAsAscii,
apps/tundra_shell.cpp:1706-1800).
"""

from __future__ import annotations

import argparse
import sys

from tundradb_spark.errors import QueryError, SchemaError
from tundradb_spark.ql.interpreter import execute_statement
from tundradb_spark.ql.parser import split_statements


def run_script(db, text: str, echo: bool = False, stop_on_error: bool = True) -> int:
    """Execute a script; returns number of failed statements."""
    failures = 0
    for stmt in split_statements(text):
        if echo:
            print(f"tundra> {stmt}")
        try:
            result = execute_statement(db, stmt)
            if result is not None:
                result.show(100, truncate=False)
        except (QueryError, SchemaError) as e:
            failures += 1
            print(f"ERROR: {e}", file=sys.stderr)
            if stop_on_error:
                return failures
    return failures


def repl(db) -> None:
    print("tundradb-spark shell — TundraQL; end statements with ';', "
          "Ctrl-D to exit")
    buf: list[str] = []
    while True:
        try:
            prompt = "tundra> " if not buf else "   ...> "
            line = input(prompt)
        except EOFError:
            print()
            return
        except KeyboardInterrupt:
            buf = []
            print()
            continue
        buf.append(line)
        joined = "\n".join(buf)
        if ";" not in line:
            continue
        buf = []
        for stmt in split_statements(joined):
            try:
                result = execute_statement(db, stmt)
                if result is not None:
                    result.show(100, truncate=False)
            except (QueryError, SchemaError) as e:
                print(f"ERROR: {e}", file=sys.stderr)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="TundraQL shell (PySpark engine)")
    ap.add_argument("--db", default=None, help="snapshot directory (enables COMMIT)")
    ap.add_argument("--script", default=None, help="run a .sql script and exit")
    ap.add_argument("--cpus", type=int, default=None, help="local[N] cores")
    ap.add_argument("--echo", action="store_true", help="echo statements (script mode)")
    args = ap.parse_args(argv)

    from tundradb_spark.database import Database
    from tundradb_spark.session import get_spark

    spark = get_spark("tundra-shell", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    db = Database(spark, path=args.db)

    if args.script:
        with open(args.script) as f:
            text = f.read()
        return 1 if run_script(db, text, echo=args.echo) else 0
    repl(db)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
