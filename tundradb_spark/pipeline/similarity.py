"""Similarity search over an embedding column (``array<float>``).

- :func:`cosine_topk` — brute-force exact cosine top-k: one narrow
  projection + a ``TakeOrderedAndProject`` (no full sort, no shuffle of the
  data — only k rows per partition reach the driver-side merge).
- :func:`lsh_ann_topk` — the scale path: sign-LSH random-hyperplane
  signatures bucket the corpus; the query probes only its own buckets, so
  the exact cosine runs on a small candidate set.  Hyperplanes are
  deterministic literals (seeded), so results are reproducible anywhere.

IVF-style partitioning note for 100 TB: persist the corpus bucketed by
``signature % N`` (``df.write.bucketBy``), so a probe touches only matching
buckets — same plan shape as below, but the bucket join prunes files too.

Everything is built-in-function only (codegen; no UDFs); the dot product is
a left-fold so any engine reproduces the exact IEEE-754 doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from tundradb_spark.pipeline.hashing import hyperplanes


def _dot_lit(v: Column, q: list[float]) -> Column:
    """Fold-left dot product of a vector column with a literal query vector."""
    out = None
    for i, c in enumerate(q):
        term = F.element_at(v, i + 1) * F.lit(c)
        out = term if out is None else out + term
    return out


def _norm_lit(q: list[float]) -> float:
    return sum(c * c for c in q) ** 0.5


def cosine_scores(
    emb: DataFrame,
    query: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine of every vector against a literal query vector."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot_vv = F.aggregate(
        F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    cos = _dot_lit(v, query) / (F.sqrt(dot_vv) * F.lit(_norm_lit(query)))
    return emb.select(
        F.col(id_col).cast("long").alias(id_col),
        F.round(cos, 6).alias("cosine"),
    )


def cosine_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force exact top-k by cosine (desc), id asc as tie-break.

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject: each partition
    keeps its local top-k, only n_partitions*k rows are merged — no global
    sort even at 100 TB.
    """
    return cosine_scores(emb, query, vec_col, id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    ).limit(k)


def lsh_signature(
    emb: DataFrame,
    n_planes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Sign-LSH signature: bit p = 1 iff dot(v, plane_p) > 0, planes a
    deterministic seeded ±1 matrix."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes = hyperplanes(n_planes, dim, seed)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = None
    for p, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(c) for c in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bit = F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return emb.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(vec_col),
        sig.alias("sig"),
    )


def lsh_ann_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 16,
    band_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: probe only vectors sharing ≥1 signature band with
    the query, then exact cosine on the candidates.

    The candidate filter is a literal predicate on the signature (the query's
    band keys are computed driver-side), so Catalyst pushes it to the scan —
    with a bucketed/partitioned corpus this prunes files, the IVF effect.
    """
    dim = len(query)
    planes = hyperplanes(n_planes, dim, seed)
    qsig = 0
    for p, plane in enumerate(planes):
        proj = sum(a * b for a, b in zip(query, plane))
        if proj > 0:
            qsig |= 1 << p
    bands = n_planes // band_bits
    mask = (1 << band_bits) - 1
    sigs = lsh_signature(emb, n_planes, vec_col, id_col, seed, dim=dim)
    cand_pred = None
    for i in range(bands):
        qband = (qsig >> (i * band_bits)) & mask
        pred = (
            F.shiftright("sig", i * band_bits).bitwiseAND(F.lit(mask)) == F.lit(qband)
        )
        cand_pred = pred if cand_pred is None else (cand_pred | pred)
    return cosine_topk(
        sigs.filter(cand_pred), query, k, vec_col=vec_col, id_col=id_col
    )
