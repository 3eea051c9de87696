"""TundraQL abstract syntax tree (one dataclass per statement form).

Mirrors the statement surface of the reference grammar
(antlr/TundraQL.g4:4-74): CREATE SCHEMA / CREATE EDGE SCHEMA / CREATE NODE /
CREATE EDGE / MATCH / UPDATE (3 modes) / DELETE (4 targets) / SHOW / COMMIT.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from tundradb_spark.query import Expr

# node selector: ("User", 123) by id, or ("User", {"name": "Alice"}) by props
Selector = tuple[str, Any]


@dataclass(frozen=True)
class NodeRef:
    """(alias:Schema) or (alias) — schema optional on re-reference."""

    alias: str
    schema: str | None


@dataclass(frozen=True)
class Hop:
    """One edge pattern between two node patterns; ``reversed`` for
    ``<-[...]-`` (direction swapped at parse time, like the reference's
    visitor, apps/tundra_shell.cpp:570-577)."""

    source: NodeRef
    target: NodeRef
    edge_type: str | None
    edge_alias: str | None
    join_type: str  # inner|left|right|full
    reversed: bool


@dataclass(frozen=True)
class CreateSchema:
    name: str
    fields: dict[str, str]
    is_edge: bool


@dataclass(frozen=True)
class CreateNode:
    schema: str
    props: dict[str, Any]
    return_id: bool


@dataclass(frozen=True)
class CreateEdge:
    edge_type: str
    source: Selector
    target: Selector
    props: dict[str, Any] = field(default_factory=dict)
    unique: bool = False


@dataclass(frozen=True)
class Match:
    hops: list[Hop]
    roots: list[NodeRef]  # single-node patterns with no edges
    where: Expr | None
    select: list[tuple[str, str | None]]  # (dotted path, AS alias)
    # -- text-surface extensions (engine capabilities the reference grammar
    # never grew productions for — its own clause enum anticipated them,
    # include/query/query.hpp:168) --
    distinct: bool = False  # SELECT DISTINCT
    group_by: list[str] = field(default_factory=list)
    aggs: list[tuple[str, str, str | None]] = field(
        default_factory=list
    )  # (fn, field-or-*, AS alias)
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (path, asc)
    limit: int | None = None
    as_of_vt: int | None = None  # AS OF <valid-time>
    as_of_tt: int | None = None  # ... TX <tx-time>


@dataclass(frozen=True)
class Update:
    # exactly one of: locator (Mode 1), pattern (Mode 2), match (Mode 3)
    locator: tuple[str, int] | None
    pattern: NodeRef | None
    match: Match | None
    assignments: dict[str, Any]
    where: Expr | None


@dataclass(frozen=True)
class Delete:
    locator: tuple[str, int] | None = None
    pattern: NodeRef | None = None
    path: Match | None = None
    edge_type: str | None = None
    edge_from: Selector | None = None
    edge_to: Selector | None = None
    where: Expr | None = None


@dataclass(frozen=True)
class Show:
    target: str  # "edges" | "edge_types"
    edge_type: str | None = None


@dataclass(frozen=True)
class Commit:
    pass


@dataclass(frozen=True)
class Explain:
    """EXPLAIN MATCH … — surface the engine's physical plan (extension;
    the reference has no plan introspection at all)."""

    inner: "Match"


@dataclass(frozen=True)
class Funnel:
    """FUNNEL ON <table> STEPS 's1', 's2', … [USER col] [TS col]
    [TYPE col] [WITHIN µs] — the ordered-funnel operator
    (operators.analytics.funnel) exposed on the text surface
    (extension; the shell gains the engine's analytics family the way
    the reference's shell fronts its own capability set)."""

    table: str
    steps: tuple[str, ...]
    user_col: str = "user_id"
    ts_col: str = "ts"
    type_col: str = "event_type"
    within_us: int | None = None


@dataclass(frozen=True)
class Retention:
    """RETENTION ON <table> [USER col] [TS col] [PERIOD µs]
    [MAX OFFSET n] — cohort retention
    (operators.analytics.cohort_retention) on the text surface."""

    table: str
    user_col: str = "user_id"
    ts_col: str = "ts"
    period_us: int = 86_400_000_000
    max_offset: int | None = None


@dataclass(frozen=True)
class Outliers:
    """OUTLIERS ON <table> [GROUP col] [VALUE col] [ID col] [Z x]
    [ROBUST [K x]] — per-group anomalies on the text surface: z-score
    (operators.analytics.value_outliers) by default, median/MAD
    (robust_outliers, threshold ``K``) with the ROBUST modifier."""

    table: str
    group_col: str = "event_type"
    value_col: str = "value"
    id_col: str = "event_id"
    z: float = 3.0
    robust: bool = False
    k: float = 3.5


@dataclass(frozen=True)
class Cusum:
    """CUSUM ON <table> SLACK x THRESHOLD y [KEY col] [VALUE col]
    [TS col] [TIEBREAK col] — one-sided CUSUM drift alarms
    (operators.relational.cusum_alarms, target = each key's own mean)."""

    table: str
    slack: float
    threshold: float
    key_col: str = "user_id"
    value_col: str = "value"
    ts_col: str = "ts"
    tiebreak_col: str | None = None


@dataclass(frozen=True)
class Markov:
    """MARKOV ON <table> [USER col] [TS col] [TYPE col] [TIEBREAK col]
    [MIN m] — first-order transition matrix over per-user event
    sequences (operators.analytics.markov_transitions)."""

    table: str
    user_col: str = "user_id"
    ts_col: str = "ts"
    type_col: str = "event_type"
    tiebreak_col: str = "event_id"
    min_count: int = 1


@dataclass(frozen=True)
class Similarity:
    """SIMILARITY ON [EDGES] <name> [SRC col] [DST col] [MIN m]
    [MAXDEG d] [EXCLUDE ADJACENT] — neighborhood Jaccard over a pair
    table or a registered edge type
    (graphs.algorithms.neighborhood_similarity)."""

    table: str
    edges: bool = False
    src: str | None = None  # None → id_a (table) / source_id (EDGES)
    dst: str | None = None  # None → id_b (table) / target_id (EDGES)
    min_common: int = 1
    max_degree: int | None = None
    include_adjacent: bool = True


@dataclass(frozen=True)
class Cooccurrence:
    """COOCCURRENCE ON <table> [USER col] [TYPE col] [MIN m] [TOP n]
    [CAP c] — unordered event-type affinity: distinct-user pair support
    + lift (operators.analytics.event_cooccurrence); CAP is the
    max-types-per-user bot guard."""

    table: str
    user_col: str = "user_id"
    type_col: str = "event_type"
    min_users: int = 1
    top_n: int | None = None
    max_types_per_user: int | None = None


@dataclass(frozen=True)
class Winsorize:
    """WINSORIZE ON <table> [GROUP col] [VALUE col] [ID col] [PLO x]
    [PHI x] — per-group quantile clipping
    (operators.analytics.winsorize), the repair twin of OUTLIERS."""

    table: str
    group_col: str = "event_type"
    value_col: str = "value"
    id_col: str = "event_id"
    p_lo: float = 0.01
    p_hi: float = 0.99


@dataclass(frozen=True)
class Benford:
    """BENFORD ON <table> [GROUP col] [VALUE col] [MIN n] — per-group
    first-digit conformance scan
    (operators.analytics.benford_deviation)."""

    table: str
    group_col: str = "event_type"
    value_col: str = "value"
    min_n: int = 100


@dataclass(frozen=True)
class Ngrams:
    """NGRAMS ON <table> [N k] [USER col] [TS col] [TYPE col] [MIN m]
    [TOP n] [TIEBREAK col] — sequential event-type n-grams
    (operators.analytics.event_ngrams)."""

    table: str
    n: int = 3
    user_col: str = "user_id"
    ts_col: str = "ts"
    type_col: str = "event_type"
    min_count: int = 1
    top_n: int | None = None
    tiebreak_col: str | None = None


@dataclass(frozen=True)
class Calibration:
    """CALIBRATION ON <table> [PROB col] [LABEL col] [BINS n] —
    reliability-diagram bins (mean predicted probability vs observed
    positive rate per equal-width bin;
    pipeline.classify.calibration_bins)."""

    table: str
    prob_col: str = "prob"
    label_col: str = "label"
    n_bins: int = 10


@dataclass(frozen=True)
class Rrf:
    """RRF ON <table_a> WITH <table_b> [K k] [TOP n] [QUERY col]
    [ID col] [SCORE col] — reciprocal-rank fusion of two per-query
    rankings (pipeline.text.rrf_fuse)."""

    table_a: str
    table_b: str
    k: int = 60
    top_n: int | None = None
    query_col: str = "query_id"
    id_col: str = "doc_id"
    score_col: str = "score"


@dataclass(frozen=True)
class Drift:
    """DRIFT ON <cur> WITH <ref> [GROUP col] [VALUE col] [LO x] [HI y]
    [BINS n] [MIN n] [EPS x] — per-group PSI / Jensen-Shannon /
    total-variation drift of cur's value histogram against ref's
    (operators.analytics.distribution_drift)."""

    cur: str
    ref: str
    group_col: str = "event_type"
    value_col: str = "value"
    lo: float = 0.0
    hi: float = 1000.0
    n_bins: int = 10
    min_n: int = 100
    eps: float = 1e-6


@dataclass(frozen=True)
class TokenDrift:
    """TOKENDRIFT ON <cur> WITH <ref> [TEXT col] — corpus-composition
    drift: token-level JSD / TV + new-token mass between two document
    snapshots (pipeline.text.token_drift)."""

    cur: str
    ref: str
    text_col: str = "text"


@dataclass(frozen=True)
class Trend:
    """TREND ON <table> EPOCH <µs> [GROUP col] [VALUE col] [TS col]
    [MIN n] — per-group OLS trend of a metric over time
    (operators.analytics.value_trend)."""

    table: str
    epoch_us: int
    group_col: str = "event_type"
    value_col: str = "value"
    ts_col: str = "ts"
    min_n: int = 100


@dataclass(frozen=True)
class Gates:
    """GATES ON <docs> [GROUP col] [TEXT col] [MAXREP x]
    [WITH weights [BUCKETS n] [MIN q] [UNIGRAMS]] — the gate-attrition
    funnel (pipeline.recipe.gate_funnel): documents/tokens lost at each
    prepare_corpus row-level gate per group, labeled by the FIRST
    failing gate; the learned-quality gate joins the report when a
    weight table is given."""

    table: str
    group_col: str = "lang"
    text_col: str = "text"
    max_bigram_rep: float = 0.5
    weights: str | None = None
    n_buckets: int = 256
    min_quality: float = 0.5
    bigrams: bool = True


@dataclass(frozen=True)
class Report:
    """REPORT ON <docs> [GROUP col] [TEXT col] [ID col] [MAXREP x]
    [WITH weights [BUCKETS n] [MIN q] [UNIGRAMS]]
    [LABELED tbl [LABEL col] PRECISION p [BINS n]]
    [SPLIT col PAIRS tbl [SRC col] [DST col]] — curation run report v2
    (pipeline.recipe.curation_report): funnel attrition (at the
    measured threshold when LABELED/PRECISION are given), the picked
    operating point, exact-dup cluster stats, corpus totals, and
    split-leakage channels, one flat (section, metric, grp, value)
    frame."""

    table: str
    group_col: str = "lang"
    text_col: str = "text"
    id_col: str = "doc_id"
    max_bigram_rep: float = 0.5
    weights: str | None = None
    n_buckets: int = 256
    min_quality: float = 0.5
    bigrams: bool = True
    labeled: str | None = None
    label_col: str = "label"
    target_precision: float | None = None
    calibration_bins: int = 10
    split_col: str | None = None
    pairs: str | None = None
    pair_src: str = "id_a"
    pair_dst: str = "id_b"


@dataclass(frozen=True)
class Skew:
    """SKEW ON <table> KEY <col> [TOP n] — key-distribution skew
    report (operators.relational.key_skew)."""

    table: str
    key_col: str
    top_n: int = 20


@dataclass(frozen=True)
class Fanout:
    """FANOUT ON <table_a> WITH <table_b> KEY <col> [KEYB col] [TOP n]
    — exact pre-join cardinality (operators.relational.join_fanout)."""

    table_a: str
    table_b: str
    key_a: str
    key_b: str | None = None
    top_n: int = 10


@dataclass(frozen=True)
class Diff:
    """DIFF ON <new> WITH <old> [ID col] [TEXT col | COLS c1, c2, …]
    [ALL] [SUMMARY] — snapshot-to-snapshot diff by md5 content digest:
    the text-corpus form (pipeline.dedup.corpus_diff /
    corpus_diff_summary) or, with COLS, the schema-agnostic row form
    (pipeline.dedup.row_diff)."""

    new: str
    old: str
    id_col: str = "doc_id"
    text_col: str = "text"
    cols: tuple[str, ...] | None = None
    include_unchanged: bool = False
    summary: bool = False


@dataclass(frozen=True)
class Quality:
    """QUALITY ON <docs> WITH <weights> [BUCKETS n] [ID col] [TEXT col]
    [UNIGRAMS] [THRESHOLDS LABEL col [BINS n]] — learned linear
    quality-filter scoring (pipeline.classify.lr_score): every document
    scored under a frozen LR weight table ``(bucket, weight)`` with the
    intercept at ``bucket = -1``.  The THRESHOLDS form instead returns
    the measured operating-point curve
    (pipeline.classify.precision_thresholds) of the keep-rule
    ``prob >= edge`` against ``<docs>``'s label column — the table a
    pipeline reads to pick its gate knob at a precision target."""

    table: str
    weights: str
    n_buckets: int = 256
    id_col: str = "doc_id"
    text_col: str = "text"
    bigrams: bool = True
    label_col: str | None = None
    n_bins: int = 10


Statement = (
    CreateSchema
    | CreateNode
    | CreateEdge
    | Match
    | Update
    | Delete
    | Show
    | Commit
    | Explain
    | Funnel
    | Retention
    | Outliers
    | Cusum
    | Ngrams
    | Markov
    | Similarity
    | Cooccurrence
    | Winsorize
    | Benford
    | Calibration
    | Rrf
    | Drift
    | TokenDrift
    | Diff
    | Skew
    | Fanout
    | Trend
    | Quality
    | Gates
    | Report
)
