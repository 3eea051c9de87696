"""Level-4 parity: end-to-end TundraQL SCRIPTS through the shell's script
runner with output assertions — the reference's test_scripts/*.sql +
run_all_tests_with_assertions.sh model (awk-extracted expectations over the
shell's ASCII output).  Each script here mirrors a reference script's
scenario; assertions grep the captured ASCII tables exactly as the
reference's harness does."""

import contextlib
import io

import pytest

from tundradb_spark.database import Database
from tundradb_spark.ql.shell import run_script


@pytest.fixture()
def db(spark):
    return Database(spark)


def run(db, script: str) -> tuple[str, int]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        failures = run_script(db, script)
    return buf.getvalue(), failures


SETUP = """
CREATE SCHEMA User (name: STRING, age: INT64);
CREATE SCHEMA Company (name: STRING);
CREATE EDGE SCHEMA WORKS_AT (since: INT64);
CREATE NODE User (name = "Alice", age = 25);
CREATE NODE User (name = "Bob", age = 31);
CREATE NODE User (name = "Cara", age = 40);
CREATE NODE Company (name = "Acme");
CREATE NODE Company (name = "Globex");
CREATE EDGE WORKS_AT FROM User(0) TO Company(0) WITH (since = 2019);
CREATE EDGE WORKS_AT FROM User(1) TO Company(0) WITH (since = 2021);
CREATE EDGE WORKS_AT FROM User(2) TO Company(1) WITH (since = 2018);
"""


def test_join_script(db):
    # reference test_scripts/join_test.sql: INNER/LEFT joins with expected
    # ASCII rows
    out, failures = run(
        db,
        SETUP
        + """
MATCH (u:User)-[:WORKS_AT]->(c:Company)
SELECT u.name AS uname, c.name AS cname;
MATCH (u:User)-[:WORKS_AT LEFT]->(c:Company) SELECT u.name AS uname;
""",
    )
    assert failures == 0
    assert "Alice" in out and "Acme" in out and "Globex" in out
    assert out.count("statement(s) executed") == 1


def test_where_and_or_script(db):
    # reference where_and_or_test.sql / parentheses_test.sql
    out, failures = run(
        db,
        SETUP
        + """
MATCH (u:User) WHERE u.age > 30 AND u.name = "Bob" SELECT u.name AS n;
MATCH (u:User) WHERE (u.age > 39 OR u.name = "Alice") SELECT u.name AS n;
""",
    )
    assert failures == 0
    assert "Bob" in out and "Cara" in out and "Alice" in out


def test_delete_edges_script(db):
    # reference delete_edges_test.sql / show_edges_test.sql: SHOW before and
    # after a selector delete
    out, failures = run(
        db,
        SETUP
        + """
SHOW EDGE TYPES;
DELETE EDGE WORKS_AT FROM User(0);
SHOW EDGE TYPES;
""",
    )
    assert failures == 0
    # edge count 3 before the delete, 2 after — both tables in the output
    assert "|3" in out.replace(" ", "") and "|2" in out.replace(" ", "")


def test_analytics_tail_script(db):
    # the extension tail through the shell runner: aggregate + order + limit
    # in pure TundraQL text (the reference's enum anticipated ORDER_BY/LIMIT,
    # include/query/query.hpp:168; its parser never grew the productions)
    out, failures = run(
        db,
        SETUP
        + """
MATCH (u:User)-[:WORKS_AT]->(c:Company)
GROUP BY c.name AGG count(*) AS n_emps, max(u.age) AS oldest
ORDER BY n_emps DESC, c.name LIMIT 2;
MATCH (u:User) SELECT u.name AS who ORDER BY u.age DESC LIMIT 1;
""",
    )
    assert failures == 0
    assert "Acme" in out and "Globex" in out and "Cara" in out
    compact = out.replace(" ", "")
    assert "|2|31|" in compact  # Acme: 2 employees, oldest 31
    assert "|1|40|" in compact  # Globex: 1 employee, oldest 40


def test_script_continues_past_failures(db):
    # reference SCRIPT_EXECUTION_FEATURE.md: execution continues, stats
    # report the failure count
    out, failures = run(
        db,
        """
CREATE SCHEMA T (v: INT64);
MATCH (x:Nope) SELECT x.v AS v;
CREATE NODE T (v = 7);
MATCH (t:T) SELECT t.v AS v;
""",
    )
    assert failures == 1
    assert "4 statement(s) executed, 1 failed" in out
    assert "|7" in out.replace(" ", "")  # the statement after the failure ran


def test_update_and_commit_script(spark, tmp_path):
    # reference batch_test.sql + COMMIT: mutate, persist, restore, re-read
    db = Database(spark, path=str(tmp_path / "qldb"))
    out, failures = run(
        db,
        SETUP
        + """
UPDATE User(1) SET age = 32;
COMMIT;
""",
    )
    assert failures == 0
    db2 = Database(spark, path=str(tmp_path / "qldb"))
    out2, f2 = run(
        db2, 'MATCH (u:User) WHERE u.name = "Bob" SELECT u.age AS age;'
    )
    assert f2 == 0
    assert "|32" in out2.replace(" ", "")


def test_detach_requires_script():
    from tundradb_spark.ql.shell import main

    with pytest.raises(SystemExit):
        main(["--detach"])


def test_detach_runs_script_in_background(tmp_path):
    # the reference's detach mode: launcher returns immediately, the
    # detached child executes the script, output lands in the log file
    import time

    from tundradb_spark.ql.shell import main

    script = tmp_path / "d.sql"
    script.write_text(
        'CREATE SCHEMA DT (name: STRING);\n'
        'CREATE NODE DT (name = "bg");\n'
        "MATCH (d:DT) SELECT d.name AS n;\n"
    )
    log = tmp_path / "d.log"
    assert main(
        ["--detach", "--script", str(script), "--log-file", str(log), "--cpus", "2"]
    ) == 0
    deadline = time.time() + 120
    while time.time() < deadline:
        if log.exists() and "0 failed" in log.read_text():
            break
        time.sleep(1)
    out = log.read_text()
    assert "bg" in out and "3 statement(s) executed, 0 failed" in out
