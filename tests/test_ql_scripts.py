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


def test_analytics_statement_chain_script(db, spark):
    """r12 (r11 verdict item 5): ONE script chaining EVERY analytics
    statement the shell supports — FUNNEL RETENTION OUTLIERS CUSUM
    NGRAMS MARKOV SIMILARITY COOCCURRENCE WINSORIZE BENFORD CALIBRATION
    RRF DRIFT TOKENDRIFT DIFF (corpus + SUMMARY + COLS) SKEW FANOUT
    TREND QUALITY GATES REPORT (r14) — through the script runner, pinning the SHELL path
    (parse →
    execute → ASCII render) per statement, the reference's level-4
    testing model (test_scripts/run_all_tests_with_assertions.sh,
    SURVEY.md §5).  test_ql.py pins execute == operator per statement;
    this pins the end-to-end surface a script user sees."""
    day_ns = 86_400 * 1_000_000_000
    ev = spark.createDataFrame(
        [
            # u1 walks the a→b→c funnel across three days
            (0, 1, 1 * day_ns, "a", 1.0),
            (1, 1, 2 * day_ns, "b", 2.0),
            (2, 1, 3 * day_ns, "c", 9.0),
            # u2 stops after b; returns on day 2 (retention)
            (3, 2, 1 * day_ns, "a", 1.5),
            (4, 2, 2 * day_ns, "b", 2.5),
            # u3 repeats 'a' with a wild value (outliers / benford 8s)
            (5, 3, 1 * day_ns, "a", 8.0),
            (6, 3, 2 * day_ns, "a", 80.0),
            (7, 3, 3 * day_ns, "a", 3.0),
        ],
        "row_id long, user_id long, ts long, event_type string,"
        " value double",
    )
    probs = spark.createDataFrame(
        [(0, 0.1, 0), (1, 0.4, 0), (2, 0.6, 1), (3, 0.9, 1)],
        "row_id long, prob double, label int",
    )
    rank_a = spark.createDataFrame(
        [(0, 1, 10, 3.0), (1, 1, 11, 2.0), (2, 1, 12, 1.0)],
        "row_id long, query_id long, doc_id long, score double",
    )
    rank_b = spark.createDataFrame(
        [(0, 1, 11, 9.0), (1, 1, 12, 8.0), (2, 1, 13, 7.0)],
        "row_id long, query_id long, doc_id long, score double",
    )
    docs_old = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "lazy dog sleeps"),
         (3, "gone tomorrow")],
        "doc_id long, text string",
    )
    docs_new = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "lazy dog RUNS"),
         (4, "brand new page")],
        "doc_id long, text string",
    )
    sim_pairs = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 10), (2, 1, 11), (3, 2, 11), (4, 3, 12)],
        "row_id long, id_a long, id_b long",
    )
    lr_w = spark.createDataFrame(
        [(0, -1, 0.25)] + [(b + 1, b, 0.02 * (b % 3)) for b in range(16)],
        "row_id long, bucket long, weight double",
    )
    for name, df in [
        ("ev", ev), ("probs", probs), ("rank_a", rank_a),
        ("rank_b", rank_b), ("docs_old", docs_old),
        ("docs_new", docs_new), ("sim_pairs", sim_pairs),
        ("lr_w", lr_w),
    ]:
        db.register_node_table(name, df, "row_id" if name != "docs_old"
                               and name != "docs_new" else "doc_id",
                               resume_counter=False)

    script = """
FUNNEL ON ev STEPS 'a', 'b', 'c' USER user_id TS ts;
RETENTION ON ev USER user_id TS ts PERIOD 86400000000;
OUTLIERS ON ev GROUP event_type VALUE value ID id Z 1;
OUTLIERS ON ev GROUP event_type VALUE value ID id ROBUST;
CUSUM ON ev SLACK 0 THRESHOLD 1 KEY user_id VALUE value TIEBREAK id;
NGRAMS ON ev N 2 USER user_id TS ts MIN 1 TIEBREAK id;
MARKOV ON ev USER user_id TS ts MIN 1 TIEBREAK id;
SIMILARITY ON sim_pairs SRC id_a DST id_b MIN 1;
COOCCURRENCE ON ev USER user_id TYPE event_type MIN 1 TOP 5;
WINSORIZE ON ev GROUP event_type VALUE value ID id PLO 0.25 PHI 0.75;
BENFORD ON ev GROUP event_type VALUE value MIN 1;
CALIBRATION ON probs PROB prob LABEL label BINS 4;
RRF ON rank_a WITH rank_b K 60 TOP 5;
DRIFT ON ev WITH ev GROUP event_type VALUE value LO 0 HI 10 BINS 5 MIN 1;
TOKENDRIFT ON docs_new WITH docs_old TEXT text;
DIFF ON docs_new WITH docs_old ID id TEXT text;
DIFF ON docs_new WITH docs_old ID id TEXT text SUMMARY;
DIFF ON docs_new WITH docs_old ID id COLS text;
SKEW ON ev KEY event_type TOP 3;
FANOUT ON ev WITH ev KEY user_id TOP 3;
TREND ON ev EPOCH 0 GROUP event_type VALUE value TS ts MIN 1;
QUALITY ON docs_new WITH lr_w BUCKETS 16 ID id;
GATES ON docs_new GROUP id TEXT text;
REPORT ON docs_new GROUP id TEXT text ID id;
"""
    out, failures = run(db, script)
    assert failures == 0, out
    assert "-- 24 statement(s) executed, 0 failed" in out
    # one distinctive rendered column per statement family — proves each
    # result table actually reached the ASCII sink
    for marker in [
        "step_idx",         # FUNNEL
        "period_offset",    # RETENTION
        "|z ",              # OUTLIERS (z mode)
        "n_group",          # OUTLIERS (robust mode shares the layout)
        "cusum",            # CUSUM
        "n_occurrences",    # NGRAMS
        "n_transitions",    # MARKOV
        "common_neighbors", # SIMILARITY
        "n_users_both",     # COOCCURRENCE
        "clipped",          # WINSORIZE
        "worst_digit",      # BENFORD
        "mean_pred",        # CALIBRATION
        "fused_rank",       # RRF
        "excluded_ref",     # DRIFT (with the r12 status column)
        "new_mass",         # TOKENDRIFT
        "old_digest",       # DIFF + DIFF COLS
        "n_docs",           # DIFF SUMMARY
        "cum_share",        # SKEW (with the r12 is_null column)
        "est_rows",         # FANOUT
        "slope_per_day",    # TREND
        "logit",            # QUALITY
        "n_tokens",         # GATES (funnel column rendered)
        "funnel_docs",      # REPORT (section rendered)
    ]:
        assert marker in out, f"missing rendered column {marker!r}"
