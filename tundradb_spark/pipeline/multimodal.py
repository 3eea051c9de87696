"""Multimodal (image/audio/video) column plumbing.

Modality payloads are opaque ``binary`` columns plus a typed metadata struct
— the layout a 100 TB multimodal corpus actually uses (bytes inline in
Parquet row groups, metadata queryable without touching the payload, column
pruning keeps payload I/O out of metadata-only scans).

Real decode needs image libs probed at call time: ``codec='real'`` uses PIL
where importable and raises ``NotImplementedError`` otherwise (this
container ships no image libs, so here it is an honest stub);
``codec='fake'`` is a deterministic stand-in exercising the identical
Spark-side machinery — Arrow-batched ``mapInPandas``, explicit output
schemas, per-batch vectorized processing, payload-pruning projections.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata-only schema for decoded images (payload column dropped — decode
#: stages should never carry the bytes forward unless asked)
IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mode", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def attach_binary(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata struct.

    Here the payload is the UTF-8 encoding of the text (a deterministic
    stand-in for image bytes); in production this column comes from the
    ingest source.  The metadata struct is computed once at ingest so later
    scans never touch the payload.
    """
    blob = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).cast("long").alias(id_col),
        blob.alias("blob"),
        F.struct(
            F.octet_length(blob).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            F.md5(F.col(text_col)).alias("digest"),
        ).alias("meta"),
    )


def blob_meta_summary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Size-bucketed payload statistics — a metadata-only scan: the
    projection prunes the payload column, so Parquet never reads the bytes."""
    withb = attach_binary(docs, text_col)
    return (
        withb.select(
            F.floor(F.col("meta.n_bytes") / 100).cast("long").alias("size_bucket"),
            F.col("meta.n_bytes").alias("n_bytes"),
            F.col("meta.digest").alias("digest"),
        )
        .groupBy("size_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.count_distinct("digest").alias("n_distinct"),
        )
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for an image decoder: derives dimensions from
    the payload bytes.  Vectorized over the Arrow batch (no per-row Python)."""
    blobs = pdf["blob"]
    n_bytes = blobs.map(len)
    first = blobs.map(lambda b: b[0] if len(b) else 0)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "width": (n_bytes % 640) + 1,
            "height": (first.astype("int64") * 4) + 1,
            "mode": "RGB",
            "n_bytes": n_bytes,
        }
    )


def _pil_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Real decoder (PIL), vectorized per Arrow batch: one Image.open per
    payload, metadata only — pixel data is never materialized (PIL reads
    headers lazily, so this is cheap even for large images)."""
    import io

    from PIL import Image

    widths, heights, modes = [], [], []
    for b in pdf["blob"]:
        with Image.open(io.BytesIO(b)) as im:
            widths.append(im.width)
            heights.append(im.height)
            modes.append(im.mode)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "width": pd.Series(widths, dtype="int64"),
            "height": pd.Series(heights, dtype="int64"),
            "mode": modes,
            "n_bytes": pdf["blob"].map(len),
        }
    )


def decode_image(blobs: DataFrame, codec: str = "real") -> DataFrame:
    """Decode image payloads to metadata via Arrow-batched ``mapInPandas``.

    ``codec='real'`` uses PIL when importable (probed at call time) and
    raises ``NotImplementedError`` otherwise — this container ships no image
    libs, so here the real path stays an honest, clearly-marked stub;
    ``codec='fake'`` runs the deterministic stand-in through the identical
    Spark plumbing: same schema, same batching, same partition-preserving
    narrow execution.
    """
    if codec == "real":
        try:
            import PIL  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "image decoding requires PIL (pillow), not available here; "
                "use codec='fake' for the deterministic test kernel"
            ) from exc
        kernel = _pil_decode_batch
    elif codec == "fake":
        kernel = _fake_decode_batch
    else:
        raise ValueError(f"unknown codec: {codec}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield kernel(pdf)

    return blobs.select("doc_id", "blob").mapInPandas(gen, IMAGE_META_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes_in", LongType()),
        StructField("resized", BinaryType()),
    ]
)


def _fake_resize_batch(
    pdf: pd.DataFrame, width: int, height: int
) -> pd.DataFrame:
    """Deterministic stand-in for an image resize: 1-D nearest-neighbor
    over the payload bytes — output pixel ``i`` is input byte
    ``(i * n) // (w*h)`` (an empty payload resizes to empty).  The rule
    is engine-portable, so the SQL oracle reproduces the resized bytes
    (and their digest) exactly.  Vectorized per row via numpy take."""
    import numpy as np

    wh = width * height
    grid = np.arange(wh, dtype="int64")

    def rz(b):
        if b is None:  # NULL payload -> NULL output, like any SQL fn
            return None
        n = len(b)
        if n == 0:
            return b""
        return np.frombuffer(b, dtype="uint8")[(grid * n) // wh].tobytes()

    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "width": width,
            "height": height,
            "n_bytes_in": pdf["blob"].map(
                lambda b: len(b) if b is not None else None
            ),
            "resized": pdf["blob"].map(rz),
        }
    )


def _pil_resize_batch(
    pdf: pd.DataFrame, width: int, height: int
) -> pd.DataFrame:
    """Real resize (PIL): decode → grayscale → nearest-neighbor resize →
    raw pixel buffer, one image per payload within the Arrow batch."""
    import io

    from PIL import Image

    out = []
    for b in pdf["blob"]:
        if b is None:  # NULL payload -> NULL output
            out.append(None)
            continue
        with Image.open(io.BytesIO(b)) as im:
            out.append(
                im.convert("L").resize((width, height)).tobytes()
            )
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "width": width,
            "height": height,
            "n_bytes_in": pdf["blob"].map(
                lambda b: len(b) if b is not None else None
            ),
            "resized": out,
        }
    )


def resize_image(
    blobs: DataFrame,
    width: int = 16,
    height: int = 4,
    codec: str = "real",
) -> DataFrame:
    """Resize image payloads to a fixed ``width × height`` pixel buffer
    via Arrow-batched ``mapInPandas`` — the normalize-before-embed stage
    of a multimodal pipeline (every downstream feature extractor wants
    one shape).

    Same codec contract as :func:`decode_image`: ``codec='real'`` uses
    PIL when importable and raises ``NotImplementedError`` otherwise
    (this container ships no image libs — an honest, clearly-marked
    stub); ``codec='fake'`` runs the deterministic nearest-neighbor
    stand-in through the identical Spark plumbing (schema, batching,
    partition-preserving narrow execution).  Output rows carry the
    resized BYTES (``w·h`` per row, or empty for empty payloads) — a
    deliberate payload-forwarding stage, unlike the metadata-only
    ``decode_image``; digest it (``F.md5``) before any driver-checked
    surface.
    """
    if width < 1 or height < 1:
        raise ValueError(f"width/height must be >= 1, got {width}x{height}")
    if codec == "real":
        try:
            import PIL  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "image resizing requires PIL (pillow), not available here;"
                " use codec='fake' for the deterministic test kernel"
            ) from exc
        kernel = _pil_resize_batch
    elif codec == "fake":
        kernel = _fake_resize_batch
    else:
        raise ValueError(f"unknown codec: {codec}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield kernel(pdf, width, height)

    return blobs.select("doc_id", "blob").mapInPandas(gen, RESIZED_SCHEMA)


def sample_frames(
    blobs: DataFrame, frame_bytes: int = 64, every_n: int = 4
) -> DataFrame:
    """'Video' frame sampling: slice every ``every_n``-th ``frame_bytes``
    window out of the payload.  Built-in functions only (substr on binary),
    so the explode stays JVM-side; at scale this is the shape of a
    keyframe-sampling stage (1/every_n payload reduction before decode)."""
    n_frames = F.floor(F.octet_length("blob") / F.lit(frame_bytes)).cast("long")
    idxs = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: i % every_n == 0,
    )
    return blobs.select(
        "doc_id",
        F.explode(idxs).alias("frame_idx"),
        F.col("blob"),
    ).select(
        "doc_id",
        "frame_idx",
        F.expr(f"substring(blob, frame_idx * {frame_bytes} + 1, {frame_bytes})").alias(
            "frame"
        ),
    )


DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("dhash", LongType()),
    ]
)

#: samples for the 1-D fake kernel: 65 byte samples → 64 adjacent
#: comparisons → 64 hash bits (the 2-D real kernel uses the classic
#: 9×8 grid for the same 64 bits)
_DHASH_SAMPLES = 65


def _fake_dhash_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a perceptual image hash: a 1-D dHash
    over the payload bytes — 65 evenly-spaced byte samples, bit i set
    when sample i+1 > sample i, packed MSB-first into a signed int64.
    Small payload edits move few samples, so near-identical payloads
    land within a small Hamming distance — the property the banded
    pair join exploits.  numpy-vectorized per Arrow batch; empty
    payloads are dropped (no samples to compare)."""
    import numpy as np

    ids, hashes = [], []
    offsets = np.arange(_DHASH_SAMPLES, dtype=np.int64)
    for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
        n = len(b)
        if n < 1:
            continue
        arr = np.frombuffer(b, dtype=np.uint8)
        cells = arr[(offsets * n) // _DHASH_SAMPLES].astype(np.int64)
        bits = cells[1:] > cells[:-1]
        h = 0
        for i in range(64):
            if bits[i]:
                h |= 1 << (63 - i)
        if h >= 1 << 63:
            h -= 1 << 64
        ids.append(doc_id)
        hashes.append(h)
    return pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype="int64"),
            "dhash": pd.Series(hashes, dtype="int64"),
        }
    )


def _pil_dhash_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Real perceptual hash (classic dHash, Krawetz 2013): decode,
    grayscale, resize to 9×8, compare horizontal neighbors row-major
    into 64 bits.  Needs PIL — gated by :func:`image_dhash`."""
    import io

    from PIL import Image

    ids, hashes = [], []
    for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
        with Image.open(io.BytesIO(b)) as im:
            px = list(im.convert("L").resize((9, 8)).getdata())
        h = 0
        bit = 0
        for r in range(8):
            for c in range(8):
                if px[r * 9 + c + 1] > px[r * 9 + c]:
                    h |= 1 << (63 - bit)
                bit += 1
        if h >= 1 << 63:
            h -= 1 << 64
        ids.append(doc_id)
        hashes.append(h)
    return pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype="int64"),
            "dhash": pd.Series(hashes, dtype="int64"),
        }
    )


def image_dhash(blobs: DataFrame, codec: str = "real") -> DataFrame:
    """64-bit perceptual hash per payload via Arrow-batched
    ``mapInPandas`` — the image counterpart of the text MinHash
    signature (cites reference behavior: the reference has no image
    ops; this extends the LLM-pipeline dedup family to the one
    modality it lacked — text ✓ shingles, embeddings ✓ cosine,
    images ✗ → dHash).

    ``codec='real'`` = classic dHash (PIL, probed at call time, honest
    ``NotImplementedError`` stub in this container);
    ``codec='fake'`` = the deterministic byte-sampling kernel with the
    same schema/batching/bit layout, reproducible in plain SQL
    (:func:`image_dhash_sql`) so the whole banded-dedup pipeline is
    oracle-checkable end to end.

    Output: ``(doc_id, dhash)`` with dhash a signed int64.
    """
    if codec == "real":
        try:
            import PIL  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "perceptual hashing requires PIL (pillow), not available "
                "here; use codec='fake' for the deterministic test kernel"
            ) from exc
        kernel = _pil_dhash_batch
    elif codec == "fake":
        kernel = _fake_dhash_batch
    else:
        raise ValueError(f"unknown codec: {codec}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield kernel(pdf)

    return blobs.select("doc_id", "blob").mapInPandas(gen, DHASH_SCHEMA)


def image_dhash_sql(table: str, text_col: str = "text") -> str:
    """DuckDB oracle reproducing ``image_dhash(codec='fake')``
    byte-exactly: the same 65 sample positions over the UTF-8 payload
    (``get_bit`` on the blob's bit view rebuilds each sampled byte),
    the same MSB-first bit packing, the same unsigned→signed fold
    (HUGEINT intermediate dodges the signed shift overflow at bit
    63)."""
    s = _DHASH_SAMPLES
    return f"""
    WITH blobs AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id, encode({text_col}) AS b,
               octet_length(encode({text_col})) AS n
        FROM {table} WHERE octet_length(encode({text_col})) >= 1
    ),
    cells AS (
        SELECT doc_id,
               [ list_sum([get_bit(b::BIT,
                                   CAST((i * n) // {s} * 8 + j AS INT))
                           * (1 << (7 - j)) FOR j IN range(8)])
                 FOR i IN range({s}) ] AS cell
        FROM blobs
    ),
    h AS (
        SELECT doc_id,
               list_sum([CASE WHEN cell[i+2] > cell[i+1]
                         THEN (1::HUGEINT << (63 - i))
                         ELSE 0::HUGEINT END
                         FOR i IN range(64)]) AS hu
        FROM cells
    )
    SELECT doc_id,
           CAST(hu - CASE WHEN hu >= 9223372036854775808::HUGEINT
                THEN 18446744073709551616::HUGEINT
                ELSE 0::HUGEINT END AS BIGINT) AS dhash
    FROM h
    """


def dhash_duplicate_pairs(
    hashes: DataFrame,
    max_hamming: int = 4,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """All pairs of payloads whose perceptual hashes differ in at most
    ``max_hamming`` of 64 bits — near-duplicate image detection, banded
    like MinHash-LSH so the corpus never self-joins quadratically.

    Completeness by pigeonhole: the 64 bits split into
    ``max_hamming + 1`` contiguous bands; a pair within the Hamming
    budget cannot differ in every band, so it MUST collide on at least
    one band — banding is a lossless prefilter here, not an
    approximation, and the exact ``bit_count(xor)`` check after the
    join makes the output exactly the brute-force pair set
    (:func:`dhash_pairs_sql` verifies against the quadratic form).

    Plan / 100 TB shape: one explode (``bands×`` rows of
    ``(band_idx, band_val, id, hash)``), ONE shuffle on the band key,
    within-bucket self-join, pair dedup, vectorized popcount filter.
    Output and intermediate volume are bounded by band-bucket
    collisions, not corpus²; degenerate buckets (constant payloads
    hashing to the same band value) concentrate like any LSH bucket —
    the same skew caveat, and the same salting remedy, as the MinHash
    band join.

    Output: ``(id_a, id_b, hamming)`` with ``id_a < id_b``.
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError(
            f"max_hamming must be in [0, 63], got {max_hamming}"
        )
    bands = max_hamming + 1
    width = 64 // bands
    pieces = []
    for i in range(bands):
        lo = i * width
        w = 64 - lo if i == bands - 1 else width
        if w >= 64:  # max_hamming=0: the band is the whole hash
            val = F.col(hash_col)
        else:
            mask = (1 << w) - 1
            val = F.expr(
                f"shiftrightunsigned({hash_col}, {lo}) & {mask}"
            )
        pieces.append(
            F.struct(F.lit(i).alias("band_idx"), val.alias("band_val"))
        )
    exploded = hashes.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("h"),
        F.explode(F.array(*pieces)).alias("band"),
    ).select("id", "h", "band.band_idx", "band.band_val")
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.h").alias("h_a"),
            F.col("b.h").alias("h_b"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.expr("h_a ^ h_b")).cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def dhash_pairs_sql(
    table: str, text_col: str = "text", max_hamming: int = 4
) -> str:
    """DuckDB oracle for the fake-kernel dedup pipeline end to end:
    hashes via :func:`image_dhash_sql`, pairs via the BRUTE-FORCE
    quadratic join — the banded operator must equal it exactly (the
    pigeonhole argument in :func:`dhash_duplicate_pairs`)."""
    return f"""
    WITH hs AS ({image_dhash_sql(table, text_col)})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
    FROM hs a JOIN hs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}
    """


# ---------------------------------------------------------------------------
# Audio: windowed-energy fingerprint (the dHash of the audio modality)
# ---------------------------------------------------------------------------

#: 64 energy comparisons need 65 windows (same shape as the 65 dHash samples)
AUDIO_FP_WINDOWS = 65

AUDIO_FP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("afp", LongType()),
    ]
)


def _pack_energy_bits(ids, energy_rows) -> pd.DataFrame:
    """bit i = energy[i+1] > energy[i], packed MSB-first into a signed
    int64 — the dHash bit layout, shared by both audio kernels."""
    out_ids, out_fps = [], []
    for doc_id, e in zip(ids, energy_rows):
        bits = e[1:] > e[:-1]
        h = 0
        for i in range(64):
            if bits[i]:
                h |= 1 << (63 - i)
        if h >= 1 << 63:
            h -= 1 << 64
        out_ids.append(doc_id)
        out_fps.append(h)
    return pd.DataFrame(
        {
            "doc_id": pd.Series(out_ids, dtype="int64"),
            "afp": pd.Series(out_fps, dtype="int64"),
        }
    )


def _window_energies(arr, w: int):
    """Sum ``arr`` over ``w`` contiguous windows (floor-split bounds,
    empty windows sum to 0) via one cumsum — vectorized, O(n)."""
    import numpy as np

    n = len(arr)
    bounds = (np.arange(w + 1, dtype=np.int64) * n) // w
    cum = np.concatenate(([0], np.cumsum(arr, dtype=np.int64)))
    return cum[bounds[1:]] - cum[bounds[:-1]]


def _fake_audio_fp_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for an audio fingerprint: the payload's raw
    bytes as the 'signal', summed over 65 equal windows, neighboring
    energies compared — WINDOWED energy (every byte contributes), unlike
    the image kernel's point samples, so it is a genuinely distinct
    kernel with its own SQL oracle.  Empty payloads are dropped."""
    import numpy as np

    ids, energies = [], []
    for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
        if len(b) < 1:
            continue
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
        ids.append(doc_id)
        energies.append(_window_energies(arr, AUDIO_FP_WINDOWS))
    return _pack_energy_bits(ids, energies)


def _wave_audio_fp_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """REAL audio fingerprint over WAV payloads — stdlib ``wave`` (no
    external codec needed, so unlike the PIL path this one actually runs
    and is CI-tested on synthesized WAVs): decode PCM, channel 0 only,
    |amplitude| summed over 65 equal windows, neighboring energies
    compared.  Amplitude-scale-invariant by construction (uniform gain
    preserves every ``>`` comparison), which is exactly the near-dup
    property the banded pair join needs.  8-bit PCM is unsigned and
    re-centered at 128; 16/32-bit are signed little-endian."""
    import io
    import wave

    import numpy as np

    dtypes = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}
    ids, energies = [], []
    for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
        with wave.open(io.BytesIO(bytes(b))) as wf:
            width, nch = wf.getsampwidth(), wf.getnchannels()
            frames = wf.readframes(wf.getnframes())
        if width not in dtypes:
            raise ValueError(f"unsupported PCM sample width: {width}")
        arr = np.frombuffer(frames, dtype=dtypes[width])[::nch]
        if len(arr) < 1:
            continue
        arr = arr.astype(np.int64)
        if width == 1:
            arr -= 128
        ids.append(doc_id)
        energies.append(_window_energies(np.abs(arr), AUDIO_FP_WINDOWS))
    return _pack_energy_bits(ids, energies)


def audio_fingerprint(blobs: DataFrame, codec: str = "real") -> DataFrame:
    """64-bit windowed-energy fingerprint per audio payload via
    Arrow-batched ``mapInPandas`` — extends the perceptual-dedup family
    to the audio modality (text ✓ shingles, embeddings ✓ cosine,
    images ✓ dHash, audio → this).  Feed the output straight into
    :func:`dhash_duplicate_pairs` (``hash_col='afp'``) for banded
    near-dup pairs with the same pigeonhole-lossless guarantee.

    ``codec='real'`` decodes WAV/PCM with the stdlib ``wave`` module —
    genuinely runnable here (no PIL-style stub) and CI-tested on
    synthesized WAVs; uniform gain changes preserve every energy
    comparison, so a re-mastered copy fingerprints identically.
    ``codec='fake'`` treats the raw payload bytes as the signal with the
    identical window/bit machinery, reproducible in plain SQL
    (:func:`audio_fingerprint_sql`) for the oracle gate.

    Output: ``(doc_id, afp)`` with afp a signed int64.
    """
    if codec == "real":
        kernel = _wave_audio_fp_batch
    elif codec == "fake":
        kernel = _fake_audio_fp_batch
    else:
        raise ValueError(f"unknown codec: {codec}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield kernel(pdf)

    return blobs.select("doc_id", "blob").mapInPandas(gen, AUDIO_FP_SCHEMA)


def audio_fingerprint_sql(table: str, text_col: str = "text") -> str:
    """DuckDB oracle reproducing ``audio_fingerprint(codec='fake')``
    byte-exactly: the same 65 floor-split windows over the UTF-8
    payload (each byte rebuilt from ``get_bit`` and summed per window —
    a triple-nested list comprehension, empty windows coalesced to 0),
    the same MSB-first packing and unsigned→signed fold as
    :func:`image_dhash_sql`."""
    w = AUDIO_FP_WINDOWS
    return f"""
    WITH blobs AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id, encode({text_col}) AS b,
               octet_length(encode({text_col})) AS n
        FROM {table} WHERE octet_length(encode({text_col})) >= 1
    ),
    e AS (
        SELECT doc_id,
               [ coalesce(list_sum(
                     [ list_sum([get_bit(b::BIT, CAST(p * 8 + j AS INT))
                                 * (1 << (7 - j)) FOR j IN range(8)])
                       FOR p IN range(CAST(i * n // {w} AS BIGINT),
                                      CAST((i + 1) * n // {w} AS BIGINT)) ]
                 ), 0)
                 FOR i IN range({w}) ] AS energy
        FROM blobs
    ),
    h AS (
        SELECT doc_id,
               list_sum([CASE WHEN energy[i+2] > energy[i+1]
                         THEN (1::HUGEINT << (63 - i))
                         ELSE 0::HUGEINT END
                         FOR i IN range(64)]) AS hu
        FROM e
    )
    SELECT doc_id,
           CAST(hu - CASE WHEN hu >= 9223372036854775808::HUGEINT
                THEN 18446744073709551616::HUGEINT
                ELSE 0::HUGEINT END AS BIGINT) AS afp
    FROM h
    """


# ---------------------------------------------------------------------------
# Video: frame-level perceptual hashing + scene-change detection
# ---------------------------------------------------------------------------

FRAME_HASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("fhash", LongType()),
    ]
)


def _fake_frame_dhash_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """The image fake-dHash kernel lifted to (doc_id, frame_idx, frame)
    rows — 65 evenly-spaced byte samples per FRAME, neighbor
    comparisons packed MSB-first.  Empty frames are dropped."""
    import numpy as np

    ids, idxs, hashes = [], [], []
    offsets = np.arange(_DHASH_SAMPLES, dtype=np.int64)
    for doc_id, fi, b in zip(pdf["doc_id"], pdf["frame_idx"], pdf["frame"]):
        n = len(b)
        if n < 1:
            continue
        arr = np.frombuffer(b, dtype=np.uint8)
        cells = arr[(offsets * n) // _DHASH_SAMPLES].astype(np.int64)
        bits = cells[1:] > cells[:-1]
        h = 0
        for i in range(64):
            if bits[i]:
                h |= 1 << (63 - i)
        if h >= 1 << 63:
            h -= 1 << 64
        ids.append(doc_id)
        idxs.append(fi)
        hashes.append(h)
    return pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype="int64"),
            "frame_idx": pd.Series(idxs, dtype="int64"),
            "fhash": pd.Series(hashes, dtype="int64"),
        }
    )


def frame_dhash(frames: DataFrame) -> DataFrame:
    """Per-frame 64-bit perceptual hash over a :func:`sample_frames`
    output — Arrow-batched ``mapInPandas``, the fake byte-sampling
    kernel (a real deployment swaps in the PIL kernel per decoded
    frame; the Spark-side shape is identical).  Output:
    ``(doc_id, frame_idx, fhash)``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _fake_frame_dhash_batch(pdf)

    return frames.select("doc_id", "frame_idx", "frame").mapInPandas(
        gen, FRAME_HASH_SCHEMA
    )


def scene_changes(
    blobs: DataFrame,
    frame_bytes: int = 64,
    every_n: int = 1,
    cut_hamming: int = 20,
) -> DataFrame:
    """Scene-change (cut) detection over 'video' payloads: sample frames
    (:func:`sample_frames`), perceptually hash each
    (:func:`frame_dhash`), and compare CONSECUTIVE sampled frames —
    a hard cut flips many perceptual bits at once, while in-scene
    motion drifts a few.  The composition is the point: the same three
    reusable stages a real keyframe pipeline runs (sample → decode-hash
    → temporal lag), all shuffle work keyed on the video id.

    Plan / 100 TB shape: the frame explode is JVM-side ``substring``
    (payload bytes never cross into Python row-at-a-time), the hash is
    one Arrow-batched pass, and the lag is one window sort per video —
    ONE shuffle on ``doc_id``, state bounded by frames per video.

    Output: one row per consecutive sampled-frame pair —
    ``(doc_id, frame_idx, hamming, is_cut)`` with ``is_cut = hamming >=
    cut_hamming``; ``frame_idx`` is the LATER frame (the first frame of
    the new scene when ``is_cut``).
    """
    if not 0 <= cut_hamming <= 64:
        raise ValueError(f"cut_hamming must be in [0, 64], got {cut_hamming}")
    if every_n < 1 or frame_bytes < 1:
        raise ValueError(
            f"every_n and frame_bytes must be >= 1, got "
            f"({every_n}, {frame_bytes})"
        )
    from pyspark.sql import Window

    frames = sample_frames(blobs, frame_bytes=frame_bytes, every_n=every_n)
    fh = frame_dhash(frames)
    w = Window.partitionBy("doc_id").orderBy(F.col("frame_idx").asc())
    lagged = fh.withColumn("__prev", F.lag("fhash").over(w)).filter(
        F.col("__prev").isNotNull()
    )
    return lagged.select(
        "doc_id",
        "frame_idx",
        F.bit_count(F.expr("__prev ^ fhash")).cast("long").alias("hamming"),
        (
            F.bit_count(F.expr("__prev ^ fhash")) >= F.lit(cut_hamming)
        ).alias("is_cut"),
    )


def scene_changes_sql(
    table: str,
    text_col: str = "text",
    frame_bytes: int = 64,
    every_n: int = 1,
    cut_hamming: int = 20,
) -> str:
    """DuckDB oracle reproducing :func:`scene_changes` byte-exactly over
    the UTF-8 stand-in payloads: the same floor-split frame slices
    (``substring`` byte semantics), the same 65-sample dHash per frame
    (``get_bit`` rebuild), the same signed fold, the same lag —
    hamming via ``bit_count(xor)`` on the signed BIGINTs, identical to
    Spark's ``bit_count(a ^ b)`` two's-complement count."""
    s = _DHASH_SAMPLES
    return f"""
    WITH blobs AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id, encode({text_col}) AS b,
               octet_length(encode({text_col})) AS n
        FROM {table} WHERE octet_length(encode({text_col})) >= 1
    ),
    idx AS (
        SELECT doc_id, b, n,
               unnest(range(0, CAST(greatest(n // {frame_bytes}, 1)
                                    AS BIGINT))) AS i
        FROM blobs
    ),
    -- frame i = bytes [i*FB, i*FB + fn) of the payload; the sample
    -- positions are computed ABSOLUTELY on the whole blob (DuckDB
    -- cannot substring a BLOB), which is byte-identical to slicing
    fok AS (
        SELECT doc_id, i AS frame_idx, b,
               CAST(i * {frame_bytes} AS BIGINT) AS f0,
               least(CAST({frame_bytes} AS BIGINT),
                     n - i * {frame_bytes}) AS fn
        FROM idx
        WHERE i % {every_n} = 0 AND n - i * {frame_bytes} >= 1
    ),
    cells AS (
        SELECT doc_id, frame_idx,
               [ list_sum([get_bit(b::BIT,
                                   CAST((f0 + (i * fn) // {s}) * 8 + j
                                        AS INT))
                           * (1 << (7 - j)) FOR j IN range(8)])
                 FOR i IN range({s}) ] AS cell
        FROM fok
    ),
    h AS (
        SELECT doc_id, frame_idx,
               list_sum([CASE WHEN cell[i+2] > cell[i+1]
                         THEN (1::HUGEINT << (63 - i))
                         ELSE 0::HUGEINT END
                         FOR i IN range(64)]) AS hu
        FROM cells
    ),
    sh AS (
        SELECT doc_id, frame_idx,
               CAST(hu - CASE WHEN hu >= 9223372036854775808::HUGEINT
                    THEN 18446744073709551616::HUGEINT
                    ELSE 0::HUGEINT END AS BIGINT) AS fhash
        FROM h
    ),
    lagd AS (
        SELECT doc_id, frame_idx, fhash,
               lag(fhash) OVER (PARTITION BY doc_id
                                ORDER BY frame_idx ASC) AS prev
        FROM sh
    )
    SELECT doc_id, frame_idx,
           CAST(bit_count(xor(prev, fhash)) AS BIGINT) AS hamming,
           bit_count(xor(prev, fhash)) >= {cut_hamming} AS is_cut
    FROM lagd WHERE prev IS NOT NULL
    """
