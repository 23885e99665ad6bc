"""Multimodal-column inventory: binary payload + mapInPandas stages.

See datafusion_ballista_spark/multimodal.py for the design. The payload is
synthesized from text (no binary fixture exists), which makes every decode
DuckDB-replayable. Image (BMP via struct), audio (WAV via wave) and video
(uncompressed AVI via struct, round 6) paths all use REAL stdlib codecs —
the oracle recomputes the decoded stats from the source bytes, so a hash
match proves genuine container round-trips. ``multimodal_frame_sample``
additionally keeps the codec-free raw-chunk plumbing variant.

Oracle byte discipline (round-6 ADVICE fix): the Spark paths iterate UTF-8
BYTES of the payload, so the oracles must too. Character-based forms
(``ascii(substr(text, i, 1))`` / ``string_split(text, '')``) yield
CODEPOINTS (233 for 'é', one '' element for empty text) and silently
diverge on any non-ASCII or empty document. Every byte-consuming oracle
below therefore extracts true bytes via hex slicing —
``('0x' || substring(hex(encode(text)), 2*i-1, 2))::INTEGER`` is byte i of
the UTF-8 encoding — and empty payloads flow through a LEFT JOIN so both
engines emit the same zero-sample row. The one exception is
``multimodal_frame_sample``: its oracle must sha256 a VARCHAR (this
DuckDB build has no sha256(BLOB)), so BOTH engines enforce an explicit
ASCII-only filter (byte == char by construction) instead of assuming it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.util import tables
from datafusion_ballista_spark.multimodal import (
    ahash64,
    attach_binary,
    attach_bmp,
    audio_stats,
    featurize,
    frame_sample,
    resize,
)


def multimodal_featurize(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image codec round-trip: each doc's bytes become grayscale
    pixels of a genuine 24-bpp BMP container (width 16, zero-padded last
    row — multimodal.encode_bmp_gray); featurize re-parses the container
    and emits header-decoded dimensions plus exact integer luminance
    sums. The oracle recomputes everything from the payload's true UTF-8
    bytes, so a hash match proves the image container round-trips through
    encode -> Arrow shuffle -> decode bit-exactly."""
    d = tables(spark, sf, "documents").documents
    feats = featurize(attach_bmp(d))
    return feats.orderBy("doc_id")


# Container layout is arithmetic over the byte count: height = ceil(n/16),
# container = 54-byte headers + 48*height pixel bytes (stride 16*3, no row
# padding at width 16). Padding pixels are 0, so SUM(bytes) == px_sum and
# the mean's denominator is the full padded grid 16*height. mean_lum is
# one IEEE divide of exact ints on both engines — no rounding needed.
MULTIMODAL_FEATURIZE_SQL = """
WITH byte_vals AS (
  SELECT doc_id,
    ('0x' || substring(hex(encode(text)), 2 * i - 1, 2))::BIGINT AS a
  FROM (
    SELECT doc_id, text,
      unnest(range(1, octet_length(encode(text)) + 1)) AS i
    FROM documents
  )
)
SELECT d.doc_id,
  54 + 48 * ((octet_length(encode(d.text)) + 15) // 16) AS n_bytes,
  16 AS width,
  CAST((octet_length(encode(d.text)) + 15) // 16 AS INTEGER) AS height,
  24 AS bpp,
  CAST(COALESCE(SUM(b.a), 0) AS BIGINT) AS px_sum,
  CAST(COALESCE(SUM(b.a * b.a), 0) AS BIGINT) AS px_sum_sq,
  CASE WHEN octet_length(encode(d.text)) > 0
       THEN SUM(b.a) / (16 * ((octet_length(encode(d.text)) + 15) // 16))
       END AS mean_lum
FROM documents d
LEFT JOIN byte_vals b USING (doc_id)
GROUP BY d.doc_id, d.text
ORDER BY d.doc_id
"""


def multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling over 'video' payloads: 32-byte frames, every 4th.

    ASCII-only filter ENFORCED on both engines (not assumed): the oracle
    must sha256 a VARCHAR frame slice (no sha256(BLOB) in this DuckDB
    build), which equals the Spark side's byte-slice hash only when every
    byte is a single-byte char."""
    d = (
        tables(spark, sf, "documents")
        .documents.where(F.col("doc_id") < 50)
        .where(F.col("text").rlike("^[\\x00-\\x7F]*$"))
    )
    return frame_sample(attach_binary(d)).orderBy("doc_id", "frame_idx")


MULTIMODAL_FRAME_SQL = """
SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
  sha256(substr(text, i * 32 + 1, 32)) AS frame_sha
FROM (SELECT doc_id, text,
        unnest(range(0, (octet_length(encode(text)) + 31) // 32, 4)) AS i
      FROM documents
      WHERE doc_id < 50 AND regexp_matches(text, '^[\\x00-\\x7f]*$'))
ORDER BY doc_id, frame_idx
"""


def multimodal_resize(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image resize: decode the genuine BMP container, 2x-subsample
    the decoded pixel grid, RE-ENCODE as a width-8 BMP, decode THAT for
    the emitted stats — two full codec cycles. The oracle replays the
    subsample byte-arithmetically: pixel (r,c) of the padded 16-wide grid
    is source byte j = r*16+c, kept when r and c are both even, i.e.
    j%2==0 (16 is even, so c parity == j parity) and (j//16)%2==0."""
    d = tables(spark, sf, "documents").documents
    return resize(attach_bmp(d)).orderBy("doc_id")


# new_h = ceil(ceil(n/16)/2); container = 54 + 24*new_h (stride 8*3);
# padding pixels are 0 so the kept-byte SUM equals the resized px_sum and
# the mean denominator is the full 8*new_h sampled grid.
MULTIMODAL_RESIZE_SQL = """
WITH byte_vals AS (
  SELECT doc_id,
    ('0x' || substring(hex(encode(text)), 2 * i - 1, 2))::BIGINT AS a,
    i - 1 AS j
  FROM (
    SELECT doc_id, text,
      unnest(range(1, octet_length(encode(text)) + 1)) AS i
    FROM documents
  )
)
SELECT d.doc_id,
  54 + 24 * ((((octet_length(encode(d.text)) + 15) // 16) + 1) // 2) AS out_bytes,
  8 AS new_w,
  CAST((((octet_length(encode(d.text)) + 15) // 16) + 1) // 2 AS INTEGER) AS new_h,
  CAST(COALESCE(SUM(CASE WHEN b.j % 2 = 0 AND (b.j // 16) % 2 = 0
                         THEN b.a ELSE 0 END), 0) AS BIGINT) AS new_px_sum,
  CASE WHEN octet_length(encode(d.text)) > 0
       THEN SUM(CASE WHEN b.j % 2 = 0 AND (b.j // 16) % 2 = 0
                     THEN b.a ELSE 0 END)
            / (8 * ((((octet_length(encode(d.text)) + 15) // 16) + 1) // 2))
       END AS new_mean_lum
FROM documents d
LEFT JOIN byte_vals b USING (doc_id)
GROUP BY d.doc_id, d.text
ORDER BY d.doc_id
"""


def multimodal_audio_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Audio-style amplitude stats over payload bytes (numpy per Arrow
    batch); oracle unnests true UTF-8 bytes via hex slicing, and empty
    payloads LEFT-JOIN through as the same (0, NULL, NULL) row Spark
    emits."""
    d = tables(spark, sf, "documents").documents.where(F.col("doc_id") < 200)
    return audio_stats(attach_binary(d)).orderBy("doc_id")


MULTIMODAL_AUDIO_SQL = """
WITH byte_vals AS (
  SELECT doc_id,
    ('0x' || substring(hex(encode(text)), 2 * i - 1, 2))::BIGINT AS a
  FROM (
    SELECT doc_id, text,
      unnest(range(1, octet_length(encode(text)) + 1)) AS i
    FROM documents WHERE doc_id < 200
  )
)
SELECT d.doc_id, COUNT(b.a) AS n_samples,
  SUM(b.a) / COUNT(b.a) AS mean_amp,
  SQRT(SUM(b.a * b.a) / COUNT(b.a)) AS rms_amp
FROM documents d
LEFT JOIN byte_vals b USING (doc_id)
WHERE d.doc_id < 200
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


def multimodal_wav_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """REAL codec round-trip (no fake anywhere in this path): each doc's
    bytes become int16 PCM ((b-128)*256) inside a genuine RIFF/WAVE
    container written by the stdlib ``wave`` codec; a second mapInPandas
    stage re-parses the container — sample rate, channel count and frame
    count come from the DECODED HEADER — and computes RMS over the decoded
    frames. The oracle recomputes the expected stats from the payload's
    true UTF-8 bytes (hex-sliced — NOT characters, which diverge on
    non-ASCII text), so a hash match proves the binary container
    round-trips bit-exactly through encode -> Arrow shuffle -> decode."""
    d = tables(spark, sf, "documents").documents.where(F.col("doc_id") < 200)
    from datafusion_ballista_spark.multimodal import attach_wav, decode_wav_stats

    return (
        decode_wav_stats(attach_wav(d))
        .select(
            "doc_id",
            "sample_rate",
            "n_channels",
            "n_samples",
            F.round("rms_amp", 6).alias("rms_amp"),
        )
        .orderBy("doc_id")
    )


# (b-128)*256 per true UTF-8 byte (hex-sliced); exact integer sum of
# squares -> one IEEE divide/sqrt, matching decode_wav_stats' numpy
# arithmetic bit-for-bit. Empty payloads LEFT-JOIN through as the
# (16000, 1, 0, NULL) row the decoded empty container produces.
MULTIMODAL_WAV_SQL = """
WITH byte_vals AS (
  SELECT doc_id,
    (('0x' || substring(hex(encode(text)), 2 * i - 1, 2))::BIGINT - 128) * 256 AS s
  FROM (
    SELECT doc_id, text,
      unnest(range(1, octet_length(encode(text)) + 1)) AS i
    FROM documents WHERE doc_id < 200
  )
)
SELECT d.doc_id,
  16000 AS sample_rate,
  1 AS n_channels,
  COUNT(b.s) AS n_samples,
  ROUND(SQRT(SUM(b.s * b.s) / COUNT(b.s)), 6) AS rms_amp
FROM documents d
LEFT JOIN byte_vals b USING (doc_id)
WHERE d.doc_id < 200
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


def multimodal_video_keyframes(spark: SparkSession, sf: str) -> DataFrame:
    """REAL video codec round-trip (round 6 — retires the last stub):
    each doc's bytes become 8x8 grayscale frames of a genuine uncompressed
    AVI container (RIFF hdrl/movi/idx1 — multimodal.encode_avi_gray);
    video_keyframe_stats re-walks the RIFF tree, takes dimensions from the
    DECODED avih header and pixels from the decoded '00db' DIB chunks,
    samples every 4th frame, and emits exact integer luminance sums. The
    oracle recomputes the same stats from the payload's true UTF-8 bytes
    (hex-sliced; frame f of doc = bytes [64f, 64f+64), zero-padded), so a
    hash match proves the video container round-trips bit-exactly."""
    d = tables(spark, sf, "documents").documents.where(F.col("doc_id") < 300)
    from datafusion_ballista_spark.multimodal import attach_avi, video_keyframe_stats

    return video_keyframe_stats(attach_avi(d)).orderBy("doc_id", "frame_idx")


# Frame f covers 0-based source bytes [64f, 64f+64); padding pixels are 0
# so the per-frame byte SUM equals the decoded fr_px_sum and the mean's
# denominator is the full 8x8 grid. Empty docs encode a zero-frame AVI ->
# no rows on either engine. fr_mean_lum = exact int / 64 is one IEEE
# divide (exact: /2^6), bit-identical across engines.
MULTIMODAL_VIDEO_SQL = """
WITH byte_vals AS (
  SELECT doc_id,
    ('0x' || substring(hex(encode(text)), 2 * i - 1, 2))::BIGINT AS a,
    (i - 1) // 64 AS f
  FROM (
    SELECT doc_id, text,
      unnest(range(1, octet_length(encode(text)) + 1)) AS i
    FROM documents WHERE doc_id < 300
  )
)
SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
  8 AS width, 8 AS height,
  CAST(SUM(a) AS BIGINT) AS fr_px_sum,
  SUM(a) / 64 AS fr_mean_lum
FROM byte_vals
WHERE f % 4 = 0
GROUP BY doc_id, f
ORDER BY doc_id, frame_idx
"""


# ---------------------------------------------------------------------------
# Energy VAD — voice-activity segmentation over the real WAV codec

_VAD_FRAME = 50  # PCM samples per analysis frame


def multimodal_audio_vad(spark: SparkSession, sf: str) -> DataFrame:
    """Energy-based voice-activity detection over REAL decoded WAV
    audio: frame the decoded PCM into 50-sample windows, compute each
    frame's exact-int64 energy (sum of squared samples), mark frames
    whose energy exceeds the doc's mean frame energy as voiced (the
    classic adaptive-threshold VAD, exact integer comparison
    energy * n_frames > total_energy — no float threshold), and merge
    consecutive voiced frames into segments with the gaps-and-islands
    trick. The speech-segmentation step an audio training pipeline runs
    before transcription/alignment.

    Spark's path decodes the genuine RIFF/WAVE container
    (multimodal.decode_wav_frames — the same two-witness structure as
    the other codecs); the oracle recomputes identical frame energies
    straight from the payload's true UTF-8 bytes (hex-sliced), so a
    hash match proves codec round-trip AND segmentation algebra.

    Scale (100 TB of audio): decode + framing is one map-only Arrow
    pass emitting bounded rows (n_samples/50 per doc); threshold is one
    doc_id partial-agg join-back; islands is one per-DOC window (state
    bounded by one doc's frame count, the dedup_cdc_chunks discipline);
    segments are one more (doc_id, grp) partial agg. No global window,
    no Python past the decode."""
    from datafusion_ballista_spark.multimodal import (
        attach_wav,
        decode_wav_frames,
    )

    d = tables(spark, sf, "documents").documents.where(F.col("doc_id") < 200)
    fr = decode_wav_frames(attach_wav(d), _VAD_FRAME)
    tot = fr.groupBy("doc_id").agg(
        F.sum("energy").alias("te"), F.count(F.lit(1)).alias("nf")
    )
    voiced = fr.join(tot, "doc_id").where(
        F.col("energy") * F.col("nf") > F.col("te")
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    seg = (
        voiced.withColumn(
            "grp", F.col("frame_idx") - F.row_number().over(w)
        )
        .groupBy("doc_id", "grp")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("energy").alias("seg_energy"),
        )
    )
    w2 = Window.partitionBy("doc_id").orderBy("start_frame")
    return (
        seg.select(
            "doc_id",
            F.row_number().over(w2).alias("seg_id"),
            "start_frame",
            "end_frame",
            "n_frames",
            "seg_energy",
        )
        .orderBy("doc_id", "seg_id")
    )


MULTIMODAL_VAD_SQL = f"""
WITH samp AS (
  SELECT doc_id, (i - 1) // {_VAD_FRAME} AS f,
    (('0x' || substring(hex(encode(text)), 2 * i - 1, 2))::BIGINT - 128)
      * 256 AS s,
    octet_length(encode(text)) AS n
  FROM (
    SELECT doc_id, text,
      unnest(range(1, octet_length(encode(text)) + 1)) AS i
    FROM documents WHERE doc_id < 200)),
fr AS (
  SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
    CAST(SUM(s * s) AS BIGINT) AS energy
  FROM samp WHERE f < n // {_VAD_FRAME} GROUP BY 1, 2),
tot AS (SELECT doc_id, SUM(energy) AS te, COUNT(*) AS nf FROM fr GROUP BY 1),
voiced AS (
  SELECT fr.doc_id, frame_idx, energy
  FROM fr JOIN tot USING (doc_id) WHERE energy * nf > te),
isl AS (
  SELECT doc_id, frame_idx, energy,
    frame_idx - row_number() OVER (PARTITION BY doc_id ORDER BY frame_idx)
      AS grp
  FROM voiced),
seg AS (
  SELECT doc_id, grp, MIN(frame_idx) AS start_frame,
    MAX(frame_idx) AS end_frame, CAST(COUNT(*) AS BIGINT) AS n_frames,
    CAST(SUM(energy) AS BIGINT) AS seg_energy
  FROM isl GROUP BY 1, 2)
SELECT doc_id,
  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_frame) AS INT)
    AS seg_id,
  start_frame, end_frame, n_frames, seg_energy
FROM seg ORDER BY doc_id, seg_id
"""


# ---------------------------------------------------------------------------
# Perceptual-hash image near-dup — the multimodal member of the dedup family

_PHASH_MAX_HAM = 3  # Hamming radius; <= bands-1 so pigeonhole guarantees
_PHASH_MAX_BUCKET = 50  # frequent-band cap (the _MAX_SHINGLE_DF discipline)


def multimodal_phash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """IMAGE near-duplicate detection via perceptual average-hash over
    the REAL decoded BMPs: encode each doc as a genuine image container,
    decode it back, aHash the decoded pixels (multimodal.ahash64 — exact
    integer mean-threshold bits), then find pairs within Hamming
    distance 3 by 16-bit-band LSH: a pair at distance <= 3 must agree on
    at least one of the 4 bands (pigeonhole), so candidates come from a
    band-bucket join, NEVER an all-pairs compare. Completes the dedup
    family across modalities (text: minhash/simhash; vectors: semdedup;
    images: this).

    Two-witness structure: Spark's hash goes through the real
    encode->Arrow->decode container cycle, while the oracle recomputes
    the identical bits straight from the payload's UTF-8 bytes — a hash
    match proves both the codec round-trip and the banding algebra.

    INTENTIONAL ASYMMETRY (fails red, never silently): Spark drops docs
    whose BMP container fails to decode (b0 IS NOT NULL) while the
    oracle hashes every doc's raw bytes unconditionally. attach_bmp
    containers are generated in-process so decode cannot fail today; if
    a future fixture ships a corrupt container the two sides diverge
    STRUCTURALLY and the row goes red — by design, so a broken codec
    path can never hide behind a passing hash. (MULTIMODAL_PHASH_SQL
    carries the matching note.)

    Scale (100 TB of images): the signature table is 4 small ints per
    image; candidates are band-bucket joins with a frequent-band cap
    (buckets > 50 sigs are dropped on BOTH engines — the hot-shingle
    df-cap discipline), Hamming is 4 codegen bit_count(xor) ops, and the
    signature feeds 4 band projections + 2 pair-join sides so it is
    materialized once via GC-cleaned lazy localCheckpoint."""
    d = tables(spark, sf, "documents").documents
    sig = (
        ahash64(attach_bmp(d))
        .where(F.col("b0").isNotNull())
        .localCheckpoint(eager=False)
    )
    bands = None
    for k in range(4):
        part = sig.select(
            "doc_id", F.lit(k).alias("k"), F.col(f"b{k}").alias("val")
        )
        bands = part if bands is None else bands.unionByName(part)
    ok_buckets = (
        bands.groupBy("k", "val")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") <= _PHASH_MAX_BUCKET)
        .select("k", "val")
    )
    capped = bands.join(ok_buckets, ["k", "val"])
    cand = (
        capped.alias("x")
        .join(
            capped.alias("y"),
            (F.col("x.k") == F.col("y.k"))
            & (F.col("x.val") == F.col("y.val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(4)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(4)],
    )
    ham = sum(
        F.expr(f"bit_count(a{k} ^ bb{k})") for k in range(4)
    ).alias("hamming")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", ham)
        .where(F.col("hamming") <= _PHASH_MAX_HAM)
        .orderBy("doc_a", "doc_b")
    )


MULTIMODAL_PHASH_SQL = f"""
-- NOTE: intentionally asymmetric with the Spark side — this oracle
-- hashes EVERY doc's raw bytes while Spark keeps only docs whose BMP
-- container decodes (b0 IS NOT NULL). A corrupt container therefore
-- fails RED (structural divergence), never silently green; see the
-- multimodal_phash_neardup docstring.
WITH dims AS (
  SELECT doc_id, encode(text) AS e, octet_length(encode(text)) AS n,
    16 * ((octet_length(encode(text)) + 15) // 16) AS L
  FROM documents),
bytes AS (
  SELECT doc_id,
    CASE WHEN j < n
         THEN ('0x' || substring(hex(e), 2 * j + 1, 2))::BIGINT
         ELSE 0 END AS v,
    (j * 64) // L AS blk, L
  FROM (SELECT doc_id, e, n, L, unnest(range(0, L)) AS j FROM dims)),
blocks AS (
  SELECT doc_id, blk, SUM(v) AS s, COUNT(*) AS c, ANY_VALUE(L) AS L
  FROM bytes GROUP BY 1, 2),
tot AS (SELECT doc_id, SUM(v) AS total FROM bytes GROUP BY 1),
bits AS (
  SELECT b.doc_id, b.blk,
    CASE WHEN b.s * b.L > t.total * b.c THEN 1 ELSE 0 END AS bit
  FROM blocks b JOIN tot t USING (doc_id)),
sig AS (
  SELECT d.doc_id,
    CAST(COALESCE(SUM(CASE WHEN blk // 16 = 0
      THEN bit * (1 << (15 - blk % 16)) END), 0) AS INT) AS b0,
    CAST(COALESCE(SUM(CASE WHEN blk // 16 = 1
      THEN bit * (1 << (15 - blk % 16)) END), 0) AS INT) AS b1,
    CAST(COALESCE(SUM(CASE WHEN blk // 16 = 2
      THEN bit * (1 << (15 - blk % 16)) END), 0) AS INT) AS b2,
    CAST(COALESCE(SUM(CASE WHEN blk // 16 = 3
      THEN bit * (1 << (15 - blk % 16)) END), 0) AS INT) AS b3
  FROM dims d LEFT JOIN bits USING (doc_id) GROUP BY d.doc_id),
bandrows AS (
  SELECT doc_id, 0 AS k, b0 AS val FROM sig
  UNION ALL SELECT doc_id, 1, b1 FROM sig
  UNION ALL SELECT doc_id, 2, b2 FROM sig
  UNION ALL SELECT doc_id, 3, b3 FROM sig),
okb AS (
  SELECT k, val FROM bandrows GROUP BY 1, 2
  HAVING COUNT(*) <= {_PHASH_MAX_BUCKET}),
capped AS (SELECT b.* FROM bandrows b JOIN okb USING (k, val)),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM capped x JOIN capped y
    ON x.k = y.k AND x.val = y.val AND x.doc_id < y.doc_id)
SELECT c.doc_a, c.doc_b,
  bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1)) +
  bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3)) AS hamming
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
WHERE bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1)) +
      bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
      <= {_PHASH_MAX_HAM}
ORDER BY c.doc_a, c.doc_b
"""


QUERIES: dict[str, QuerySpec] = {
    "multimodal_audio_vad": QuerySpec(
        multimodal_audio_vad, MULTIMODAL_VAD_SQL
    ),
    "multimodal_phash_neardup": QuerySpec(
        multimodal_phash_neardup, MULTIMODAL_PHASH_SQL
    ),
    "multimodal_featurize": QuerySpec(multimodal_featurize, MULTIMODAL_FEATURIZE_SQL),
    "multimodal_wav_roundtrip": QuerySpec(
        multimodal_wav_roundtrip, MULTIMODAL_WAV_SQL
    ),
    "multimodal_frame_sample": QuerySpec(
        multimodal_frame_sample, MULTIMODAL_FRAME_SQL
    ),
    "multimodal_resize": QuerySpec(multimodal_resize, MULTIMODAL_RESIZE_SQL),
    "multimodal_audio_stats": QuerySpec(
        multimodal_audio_stats, MULTIMODAL_AUDIO_SQL
    ),
    "multimodal_video_keyframes": QuerySpec(
        multimodal_video_keyframes, MULTIMODAL_VIDEO_SQL
    ),
}
