"""Property-based tests (hypothesis) — the reference's fuzz-adjacent test
strategy (SURVEY §5: null-corpus + randomized operator checks) applied to
the two hand-written translation layers, where a subtle mistranslation
would silently corrupt results rather than error.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_ballista_spark.sql import similar_to_regex

# Semantics note: our translator implements SQL-STANDARD SIMILAR TO
# (% and _ are wildcards, regex specials like . ^ $ are literals — the
# PostgreSQL behavior, pinned by tests/test_sql_shims.py). DuckDB's
# SIMILAR TO deviates from the standard (it full-matches the raw pattern
# as a regex: '.' matches any char, '%' is a literal), so the property
# below runs on the alphabet where the two semantics coincide: literals
# plus the metacharacters SIMILAR TO passes through to regex unchanged.
_PAT_CHARS = st.sampled_from(list("abc|*+?()"))
_STR_CHARS = st.sampled_from(list("abcx"))


@settings(max_examples=300, deadline=None)
@given(
    pat=st.text(_PAT_CHARS, min_size=0, max_size=8),
    s=st.text(_STR_CHARS, min_size=0, max_size=10),
)
def test_similar_to_matches_oracle_semantics(pat, s):
    """The translated regex must agree with DuckDB's native SIMILAR TO on
    every (pattern, string) pair in the shared-semantics alphabet."""
    import duckdb

    try:
        rx = similar_to_regex(pat)
        ours = re.fullmatch(rx[4:-2], s) is not None  # strip ^(?: )$
    except re.error:
        # translator may emit a regex invalid for malformed patterns
        # (e.g. dangling '*'); DuckDB errors on those too — skip
        return
    con = duckdb.connect()
    try:
        theirs = con.execute(
            "SELECT ? SIMILAR TO ?", [s, pat]
        ).fetchone()[0]
    except duckdb.Error:
        return  # malformed pattern on both sides
    finally:
        con.close()
    assert ours == theirs, f"pattern={pat!r} string={s!r} rx={rx!r}"


@settings(max_examples=20, deadline=None)
@given(
    left=st.lists(st.one_of(st.none(), st.integers(0, 5)), max_size=8),
    right=st.lists(st.one_of(st.none(), st.integers(0, 5)), max_size=8),
)
def test_not_in_join_matches_spark_sql(spark, left, right):
    """not_in_join must reproduce Spark SQL's own three-valued NOT IN on
    arbitrary null-bearing inputs — the reference's null corpus
    (ballista/client/tests/null_aware.rs) as a property."""
    from pyspark.sql import types as T

    from datafusion_ballista_spark.inventory.util import not_in_join

    schema = T.StructType([T.StructField("k", T.IntegerType(), True)])
    ldf = spark.createDataFrame([(v,) for v in left], schema)
    rdf = spark.createDataFrame(
        [(v,) for v in right],
        T.StructType([T.StructField("rk", T.IntegerType(), True)]),
    )
    ldf.createOrReplaceTempView("prop_l")
    rdf.createOrReplaceTempView("prop_r")
    nkey = lambda v: (v is None, v)  # noqa: E731 — None-safe sort
    expected = sorted(
        (
            r.k
            for r in spark.sql(
                "SELECT k FROM prop_l WHERE k NOT IN (SELECT rk FROM prop_r)"
            ).collect()
        ),
        key=nkey,
    )
    got = sorted(
        (r.k for r in not_in_join(ldf, "k", rdf, "rk").collect()), key=nkey
    )
    assert got == expected, f"left={left} right={right}"


# --- BMP codec: encode/decode total round-trip (round 6) --------------------
# The real stdlib image codec must round-trip ANY grayscale payload
# bit-exactly at both supported widths, and its subsample->re-encode
# resize must equal the pure-numpy subsample of the source grid.


@settings(max_examples=200, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=1024),
    width=st.sampled_from([8, 16]),
)
def test_bmp_roundtrip_bit_exact(data, width):
    from datafusion_ballista_spark.multimodal import decode_bmp, encode_bmp_gray

    pad = (-len(data)) % width
    gray = data + b"\x00" * pad
    blob = encode_bmp_gray(gray, width=width)
    w, h, back = decode_bmp(blob)
    assert (w, h) == (width, len(gray) // width)
    assert back == gray


@settings(max_examples=100, deadline=None)
@given(data=st.binary(min_size=1, max_size=512))
def test_bmp_resize_cycle_matches_numpy_subsample(data):
    import numpy as np

    from datafusion_ballista_spark.multimodal import decode_bmp, encode_bmp_gray

    pad = (-len(data)) % 16
    gray = data + b"\x00" * pad
    w, h, g = decode_bmp(encode_bmp_gray(gray))
    grid = np.frombuffer(g, dtype=np.uint8).reshape(h, w)
    small = np.ascontiguousarray(grid[::2, ::2])
    nw, nh, ngray = decode_bmp(encode_bmp_gray(small.tobytes(), width=8))
    assert (nw, nh) == (8, (h + 1) // 2)
    assert ngray == small.tobytes()


@settings(max_examples=200, deadline=None)
@given(junk=st.binary(min_size=0, max_size=200))
def test_bmp_decode_never_crashes_unstructured(junk):
    """decode_bmp on arbitrary bytes either returns a valid decode (only
    if the bytes genuinely form a supported BMP) or raises ValueError —
    never IndexError/struct.error/segfault-adjacent behavior."""
    from datafusion_ballista_spark.multimodal import decode_bmp

    try:
        w, h, gray = decode_bmp(junk)
        assert w >= 0 and h >= 0 and len(gray) == w * h
    except ValueError:
        pass


@settings(max_examples=150, deadline=None)
@given(
    payload=st.binary(min_size=0, max_size=400),
)
def test_avi_roundtrip_bit_exact(payload):
    """AVI encode->decode returns the exact frame list for any payload
    chunking (the video analogue of the BMP/WAV round-trip properties)."""
    from datafusion_ballista_spark.multimodal import (
        VIDEO_FRAME_H,
        VIDEO_FRAME_W,
        decode_avi,
        encode_avi_gray,
    )

    fsz = VIDEO_FRAME_W * VIDEO_FRAME_H
    pad = (-len(payload)) % fsz
    b = payload + b"\x00" * pad
    frames = [b[i : i + fsz] for i in range(0, len(b), fsz)]
    w, h, fps, back = decode_avi(encode_avi_gray(frames))
    assert (w, h, fps) == (VIDEO_FRAME_W, VIDEO_FRAME_H, 10)
    assert back == frames


@settings(max_examples=200, deadline=None)
@given(junk=st.binary(min_size=0, max_size=300))
def test_avi_decode_never_crashes_unstructured(junk):
    """decode_avi on arbitrary bytes either decodes (only for genuine
    AVIs) or raises ValueError — never IndexError/struct.error."""
    from datafusion_ballista_spark.multimodal import decode_avi

    try:
        w, h, fps, frames = decode_avi(junk)
        assert w > 0 and h > 0
    except ValueError:
        pass


@settings(max_examples=150, deadline=None)
@given(cut=st.integers(min_value=0, max_value=1000))
def test_avi_decode_never_crashes_truncated(cut):
    """Truncating a VALID container at any byte offset must yield either
    a successful partial-header-independent decode or ValueError — the
    corrupt-payload degradation contract depends on this (a task must
    never die on a half-uploaded media blob)."""
    from datafusion_ballista_spark.multimodal import decode_avi, encode_avi_gray

    blob = encode_avi_gray([bytes(range(64)), bytes(64)])
    try:
        decode_avi(blob[: min(cut, len(blob))])
    except ValueError:
        pass
