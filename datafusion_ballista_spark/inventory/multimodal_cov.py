"""Multimodal-column inventory: binary payload + mapInPandas stages.

See datafusion_ballista_spark/multimodal.py for the design. The payload is
synthesized from text (no binary fixture exists), which makes every fake
decode DuckDB-replayable.

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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.util import tables
from datafusion_ballista_spark.multimodal import (
    attach_binary,
    audio_stats,
    featurize,
    frame_sample,
    resize,
)


def multimodal_featurize(spark: SparkSession, sf: str) -> DataFrame:
    """Binary feature extraction (Arrow-batched mapInPandas) — length,
    digest, fake-decoded header fields."""
    d = tables(spark, sf, "documents").documents
    feats = featurize(attach_binary(d))
    return feats.orderBy("doc_id")


# CASE guards mirror fake_decode_header's len checks: missing bytes are 0.
# Header fields read true UTF-8 BYTES 1/2 via hex slicing (sha256(VARCHAR)
# already hashes the UTF-8 bytes, matching Spark's sha2 over encode(text)).
MULTIMODAL_FEATURIZE_SQL = """
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  sha256(text) AS sha256,
  CASE WHEN octet_length(encode(text)) >= 1
       THEN CAST((('0x' || substring(hex(encode(text)), 1, 2))::INTEGER % 64) + 1 AS INTEGER)
       ELSE 0 END AS width,
  CASE WHEN octet_length(encode(text)) >= 2
       THEN CAST((('0x' || substring(hex(encode(text)), 3, 2))::INTEGER % 64) + 1 AS INTEGER)
       ELSE 0 END AS height
FROM documents
ORDER BY doc_id
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
    """Fake image resize (every 2nd byte) — emitted length/dims recomputable
    from the text payload's UTF-8 bytes (oracle hex-slices true bytes)."""
    d = tables(spark, sf, "documents").documents
    return resize(attach_binary(d)).orderBy("doc_id")


# Resized payload keeps every 2nd byte, so its header bytes map to source
# BYTES 1 and 3 (hex-sliced, not chars); the CASE guards mirror
# fake_decode_header on the RESIZED length ((n+1)//2): new_w needs >=1
# source byte, new_h needs >=3.
MULTIMODAL_RESIZE_SQL = """
SELECT doc_id,
  (octet_length(encode(text)) + 1) // 2 AS out_bytes,
  CASE WHEN octet_length(encode(text)) >= 1
       THEN CAST((('0x' || substring(hex(encode(text)), 1, 2))::INTEGER % 64) + 1 AS INTEGER)
       ELSE 0 END AS new_w,
  CASE WHEN octet_length(encode(text)) >= 3
       THEN CAST((('0x' || substring(hex(encode(text)), 5, 2))::INTEGER % 64) + 1 AS INTEGER)
       ELSE 0 END AS new_h
FROM documents
ORDER BY doc_id
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


QUERIES: dict[str, QuerySpec] = {
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
}
