"""Multimodal-column inventory: binary payload + mapInPandas stages.

See datafusion_ballista_spark/multimodal.py for the design. The payload is
synthesized from text (no binary fixture exists), which makes every fake
decode DuckDB-replayable: the oracle recomputes byte lengths, sha256 and the
fake header fields from ``text::BLOB``.
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


# CASE guards mirror fake_decode_header's len checks: missing bytes are 0,
# whereas ascii('') would otherwise yield 0 % 64 + 1 = 1 on short payloads.
MULTIMODAL_FEATURIZE_SQL = """
SELECT doc_id,
  octet_length(text::BLOB) AS n_bytes,
  sha256(text) AS sha256,
  CASE WHEN octet_length(text::BLOB) >= 1
       THEN CAST((ascii(substr(text, 1, 1)) % 64) + 1 AS INTEGER)
       ELSE 0 END AS width,
  CASE WHEN octet_length(text::BLOB) >= 2
       THEN CAST((ascii(substr(text, 2, 1)) % 64) + 1 AS INTEGER)
       ELSE 0 END AS height
FROM documents
ORDER BY doc_id
"""


def multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling over 'video' payloads: 32-byte frames, every 4th."""
    d = tables(spark, sf, "documents").documents.where(F.col("doc_id") < 50)
    return frame_sample(attach_binary(d)).orderBy("doc_id", "frame_idx")


MULTIMODAL_FRAME_SQL = """
SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
  sha256(substr(text, i * 32 + 1, 32)) AS frame_sha
FROM (SELECT doc_id, text,
        unnest(range(0, (octet_length(text::BLOB) + 31) // 32, 4)) AS i
      FROM documents WHERE doc_id < 50)
ORDER BY doc_id, frame_idx
"""


def multimodal_resize(spark: SparkSession, sf: str) -> DataFrame:
    """Fake image resize (every 2nd byte) — emitted length/dims recomputable
    from the text payload byte-arithmetically (ASCII fixture: byte == char)."""
    d = tables(spark, sf, "documents").documents
    return resize(attach_binary(d)).orderBy("doc_id")


# Resized payload keeps every 2nd byte, so its header bytes map to source
# bytes 1 and 3; the CASE guards mirror fake_decode_header on the RESIZED
# length ((n+1)//2): new_w needs >=1 source byte, new_h needs >=3.
MULTIMODAL_RESIZE_SQL = """
SELECT doc_id,
  (octet_length(text::BLOB) + 1) // 2 AS out_bytes,
  CASE WHEN octet_length(text::BLOB) >= 1
       THEN CAST((ascii(substr(text, 1, 1)) % 64) + 1 AS INTEGER)
       ELSE 0 END AS new_w,
  CASE WHEN octet_length(text::BLOB) >= 3
       THEN CAST((ascii(substr(text, 3, 1)) % 64) + 1 AS INTEGER)
       ELSE 0 END AS new_h
FROM documents
ORDER BY doc_id
"""


def multimodal_audio_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Audio-style amplitude stats over payload bytes (numpy per Arrow
    batch); oracle unnests characters (ASCII: ascii(char) == byte value)."""
    d = tables(spark, sf, "documents").documents.where(F.col("doc_id") < 200)
    return audio_stats(attach_binary(d)).orderBy("doc_id")


MULTIMODAL_AUDIO_SQL = """
SELECT doc_id, COUNT(*) AS n_samples,
  SUM(a) / COUNT(*) AS mean_amp,
  SQRT(SUM(a * a) / COUNT(*)) AS rms_amp
FROM (
  SELECT doc_id, ascii(unnest(string_split(text, ''))) AS a
  FROM documents WHERE doc_id < 200
)
GROUP BY doc_id
ORDER BY doc_id
"""


def multimodal_wav_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """REAL codec round-trip (no fake anywhere in this path): each doc's
    bytes become int16 PCM ((b-128)*256) inside a genuine RIFF/WAVE
    container written by the stdlib ``wave`` codec; a second mapInPandas
    stage re-parses the container — sample rate, channel count and frame
    count come from the DECODED HEADER — and computes RMS over the decoded
    frames. The oracle recomputes the expected stats directly from the
    source bytes, so a hash match proves the binary container round-trips
    bit-exactly through encode -> Arrow shuffle -> decode."""
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


# (b-128)*256 per byte; exact integer sum of squares -> one IEEE
# divide/sqrt, matching decode_wav_stats' numpy arithmetic bit-for-bit.
MULTIMODAL_WAV_SQL = """
SELECT doc_id,
  16000 AS sample_rate,
  1 AS n_channels,
  COUNT(*) AS n_samples,
  ROUND(SQRT(SUM(CAST(s * s AS BIGINT)) / COUNT(*)), 6) AS rms_amp
FROM (
  SELECT doc_id,
    CAST((ascii(unnest(string_split(text, ''))) - 128) * 256 AS BIGINT) AS s
  FROM documents WHERE doc_id < 200
)
GROUP BY doc_id
ORDER BY doc_id
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
