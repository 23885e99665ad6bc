"""Training-data assembly pipeline: the last mile between a curated
corpus (pipeline_text) and a training run — deterministic splits,
stratified sampling, sequence packing, benchmark-contamination checks,
and mixture weighting. Beyond-reference (the reference engine has no
data-pipeline layer); sits alongside pipeline_text/pipeline_vector as
the LLM-data surface over the ``documents`` fixture.

Everything is hash-deterministic — no Bernoulli RNG anywhere — so every
entry has an exact DuckDB oracle AND re-runs reproducibly on a cluster:
the split/sample decisions come from md5(doc_id) buckets (``md5`` is
engine-identical; folded via the shared 48-bit hex trick), not from
``rand()``/``sampleBy`` whose draws no second engine can replay.

Scale notes (100 TB):
- split/sample/mixture are map-side expressions + one partial/final
  aggregate each — no shuffle beyond the final groupBy;
- sequence packing windows WITHIN a shard key (doc_id % nshards), so the
  cumulative-token window is a per-shard sort, never global;
- the contamination check is shingle-bucketed exactly like the dedup
  family (explode -> semi-join on the shingle hash, hot-shingle cap
  inherited from pipeline_text) — never an all-pairs compare.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from datafusion_ballista_spark.inventory import QuerySpec
from datafusion_ballista_spark.inventory.pipeline_text import (
    _MAX_SHINGLE_DF,
    _h48,
    _shingles,
    _spread_for_explode,
    _tokens,
)
from datafusion_ballista_spark.inventory.util import tables

_PACK_TOKENS = 512  # context-window budget per packed sequence
_NSHARDS = 8


def _hash_bucket(c: Column, mod: int) -> Column:
    """md5-derived uniform bucket in [0, mod) — engine-identical."""
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        % mod
    )


def _hash_bucket_sql(expr: str, mod: int) -> str:
    return f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 12))::BIGINT % {mod})"


# ---------------------------------------------------------------------------
# 1. deterministic train/val/test split


def train_split_hash(spark: SparkSession, sf: str) -> DataFrame:
    """80/10/10 train/val/test split by md5(doc_id) bucket — the split a
    doc lands in is a pure function of its id, so adding data or
    re-running on a different cluster never reshuffles membership.
    Output: per (split, lang) doc and char counts."""
    d = tables(spark, sf, "documents").documents
    b = _hash_bucket(F.col("doc_id"), 100)
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


TRAIN_SPLIT_SQL = f"""
SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (SELECT lang, n_chars, {_hash_bucket_sql('doc_id', 100)} AS b
      FROM documents)
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# 2. stratified (per-language) sampling


_LANG_RATES = {"en": 1000, "de": 500, "fr": 500, "es": 250, "zh": 250}
# per-mille keep rates: en 100%, de/fr 50%, es/zh 25%


def train_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language downsampling at fixed per-mille rates, decided by an
    independent salted hash (salt keeps it uncorrelated with the
    train/val split). Output: kept vs total per language — the realized
    rate converges to the target as the corpus grows."""
    d = tables(spark, sf, "documents").documents
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in _LANG_RATES.items()
        ],
        F.lit(0),
    )
    keep = _hash_bucket(F.concat(F.col("doc_id").cast("string"), F.lit("#s")), 1000) < rate
    return (
        d.select("lang", keep.cast("int").alias("kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_kept"),
        )
        .orderBy("lang")
    )


_RATE_CASE_SQL = (
    "CASE "
    + " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in _LANG_RATES.items())
    + " ELSE 0 END"
)

TRAIN_SAMPLE_SQL = f"""
SELECT lang, COUNT(*) AS n_total,
  CAST(SUM(CASE WHEN
    (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#s'), 1, 12))::BIGINT
     % 1000) < {_RATE_CASE_SQL}
    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# 3. sequence packing


def train_seq_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Pack documents into fixed-token-budget training sequences: docs
    are sharded (doc_id % N so packing parallelizes), ordered
    deterministically within the shard, and assigned to bins by the
    cumulative token count — floor(cum_before / budget), the streaming
    first-fit discipline expressed as one bounded window. Output: per-bin
    doc counts and token fill levels for the first shards."""
    d = tables(spark, sf, "documents").documents
    toks = d.select(
        "doc_id",
        (F.col("doc_id") % _NSHARDS).alias("shard"),
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "bin",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / _PACK_TOKENS),
    )
    return (
        packed.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("bin_tokens"),
        )
        .where(F.col("shard") < 2)
        .orderBy("shard", "bin")
    )


TRAIN_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id, doc_id % {_NSHARDS} AS shard,
         len(string_split(trim(text), ' ')) AS n_tok
  FROM documents),
packed AS (
  SELECT shard, doc_id, n_tok,
    CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
        / {_PACK_TOKENS}) AS BIGINT) AS bin
  FROM toks)
SELECT shard, bin, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
FROM packed WHERE shard < 2
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# 4. benchmark-contamination check


def train_contamination_ngram(spark: SparkSession, sf: str) -> DataFrame:
    """Flag training documents sharing any word-3-gram with a held-out
    benchmark set (doc_id % 97 == 0 stands in for the benchmark) — the
    decontamination sweep every pretraining corpus needs.

    Plan (round-5 rewrite): the old bench-distinct → semi-join →
    double-distinct formulation evaluated the shingle explode in six
    subtrees; this one touches it twice.  A single groupBy on the shingle
    computes BOTH the hot-shingle document frequency (the scale cap,
    pipeline_text._MAX_SHINGLE_DF) and a "some benchmark doc contains this
    shingle" flag; joining that 2-column table back to the exploded pairs
    and max-ing the flag per train doc answers contamination in exactly
    two shuffles (s, then doc_id).  groupBy+join is chosen over a window
    on purpose: partial aggregation caps the map-side cost of hot
    shingles and AQE's skew-join split handles them at the join — a
    PARTITION BY s window would put every occurrence of a hot shingle on
    one task.  Cost stays Σ per-shingle matches, never |train|×|bench|.

    Shingles are folded to the shared 48-bit md5 hash (pipeline_text
    ``_h48``, bit-identical in DuckDB) BEFORE the shuffle: 8-byte int
    keys instead of ~30-byte strings cut shuffle volume ~4x, and the
    MinHash signature path already matches on exactly this fold — a
    48-bit collision (odds ~n²/2⁴⁹) would flag one extra doc pair in
    both engines identically."""
    d = _spread_for_explode(spark, tables(spark, sf, "documents").documents)
    arr = _tokens(F.col("text"))
    ex = (
        d.where(F.size(arr) >= 3)
        .select("doc_id", F.explode(_shingles(arr)).alias("s"))
        .select("doc_id", _h48(F.col("s")).alias("s"))
        .withColumn("is_bench", (F.col("doc_id") % 97 == 0).cast("int"))
    )
    per_shingle = ex.groupBy("s").agg(
        F.count(F.lit(1)).alias("df"),
        F.max("is_bench").alias("has_bench"),
    )
    doc_flags = (
        ex.join(per_shingle, "s")
        .where((F.col("is_bench") == 0) & (F.col("df") <= _MAX_SHINGLE_DF))
        .groupBy("doc_id")
        .agg(F.max("has_bench").alias("c"))
    )
    return doc_flags.agg(
        F.count(F.lit(1)).alias("n_train_docs"),
        F.sum("c").cast("bigint").alias("n_contaminated"),
    )


# Mirrors the Spark plan exactly: one per-hashed-shingle aggregate
# computing (df, has_bench), joined back, max-ed per train doc.
TRAIN_CONTAMINATION_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS arr FROM documents),
sh AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(arr)-1),
      i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingles
  FROM toks WHERE len(arr) >= 3),
ex AS (
  SELECT doc_id, ('0x' || substr(md5(s), 1, 12))::BIGINT AS x
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
per AS (
  SELECT x, COUNT(*) AS df,
         MAX(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS has_bench
  FROM ex GROUP BY x),
doc_flags AS (
  SELECT e.doc_id, MAX(p.has_bench) AS c
  FROM ex e JOIN per p USING (x)
  WHERE e.doc_id % 97 <> 0 AND p.df <= {_MAX_SHINGLE_DF}
  GROUP BY e.doc_id)
SELECT COUNT(*) AS n_train_docs,
       CAST(SUM(c) AS BIGINT) AS n_contaminated
FROM doc_flags
"""


# ---------------------------------------------------------------------------
# 4b. split-leakage audit


def train_split_leakage(spark: SparkSession, sf: str) -> DataFrame:
    """Near-duplicate pairs that straddle the train/val/test boundary —
    the quieter cousin of benchmark contamination: a test doc whose
    near-twin sits in train leaks evaluation signal even though the ids
    differ.  Audits the SAME hash split ``train_split_hash`` assigns and
    the SAME MinHash-LSH candidate generation the dedup layer uses
    (``pipeline_text.dedup_minhash_lsh`` — banded candidates, never
    all-pairs), so the report is consistent with both: every candidate
    pair with signature agreement >= 0.5 whose members land in different
    splits, with the split on each side.  Scale shape inherits LSH's
    (groupBy band key + bounded in-bucket join); the split label is a
    map-side hash expression, so the audit adds zero extra shuffles."""
    from datafusion_ballista_spark.inventory.pipeline_text import (
        dedup_minhash_lsh,
    )

    def split_of(c: Column) -> Column:
        b = _hash_bucket(c, 100)
        return F.when(b < 80, "train").when(b < 90, "val").otherwise("test")

    return (
        dedup_minhash_lsh(spark, sf)
        .where(F.col("est_jaccard") >= 0.5)
        .select(
            "da",
            "db",
            "est_jaccard",
            split_of(F.col("da")).alias("split_a"),
            split_of(F.col("db")).alias("split_b"),
        )
        .where(F.col("split_a") != F.col("split_b"))
        .orderBy("da", "db")
    )


def _split_case_sql(expr: str) -> str:
    b = _hash_bucket_sql(expr, 100)
    return (
        f"CASE WHEN {b} < 80 THEN 'train' "
        f"WHEN {b} < 90 THEN 'val' ELSE 'test' END"
    )


def _train_leakage_sql() -> str:
    from datafusion_ballista_spark.inventory.pipeline_text import (
        _minhash_oracle_sql,
    )

    return f"""
SELECT da, db, est_jaccard, {_split_case_sql('da')} AS split_a,
       {_split_case_sql('db')} AS split_b
FROM ({_minhash_oracle_sql()}) mh
WHERE est_jaccard >= 0.5
  AND {_split_case_sql('da')} <> {_split_case_sql('db')}
ORDER BY da, db
"""


# ---------------------------------------------------------------------------
# 5. mixture weighting


_TARGET_WEIGHTS = {"en": 40, "de": 15, "fr": 15, "es": 15, "zh": 15}
# target percent of the training mixture per language


def train_mix_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Mixture rebalancing report: each language's actual char share vs
    its target weight, and the sampling multiplier (target/actual) a
    weighted loader would apply. Shares divide in DOUBLE on both sides;
    the totals come from a 5-row aggregate crossJoined as a genuine
    scalar broadcast."""
    d = tables(spark, sf, "documents").documents
    per_lang = d.groupBy("lang").agg(F.sum("n_chars").alias("chars"))
    total = per_lang.agg(F.sum("chars").alias("total_chars"))
    target = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in _TARGET_WEIGHTS.items()
        ],
        F.lit(0),
    )
    return (
        per_lang.crossJoin(F.broadcast(total))
        .select(
            "lang",
            F.col("chars").cast("bigint").alias("chars"),
            F.round(
                F.col("chars").cast("double")
                * 100
                / F.col("total_chars").cast("double"),
                6,
            ).alias("actual_pct"),
            target.cast("bigint").alias("target_pct"),
            F.round(
                target.cast("double")
                * F.col("total_chars").cast("double")
                / (F.col("chars").cast("double") * 100),
                6,
            ).alias("multiplier"),
        )
        .orderBy("lang")
    )


_TARGET_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in _TARGET_WEIGHTS.items()
    )
    + " ELSE 0 END"
)

TRAIN_MIX_SQL = f"""
WITH per_lang AS (
  SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY lang),
tot AS (SELECT CAST(SUM(chars) AS BIGINT) AS total_chars FROM per_lang)
SELECT lang, chars,
  ROUND(CAST(chars AS DOUBLE) * 100 / CAST(total_chars AS DOUBLE), 6)
    AS actual_pct,
  CAST({_TARGET_CASE_SQL} AS BIGINT) AS target_pct,
  ROUND(CAST({_TARGET_CASE_SQL} AS DOUBLE) * CAST(total_chars AS DOUBLE)
        / (CAST(chars AS DOUBLE) * 100), 6) AS multiplier
FROM per_lang, tot
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# 7. context-window chunking

_CHUNK_TOKENS = 128  # context-window size in tokens
_CHUNK_STRIDE = 96  # 32-token overlap between consecutive windows


def train_doc_chunking(spark: SparkSession, sf: str) -> DataFrame:
    """Split each document into overlapping context windows for training:
    chunk k covers whitespace tokens [96k, 96k+128) — the standard
    sliding-window-with-overlap discipline so no span longer than the
    overlap is lost at a boundary. Everything is JVM-side codegen:
    ``sequence`` builds the start offsets, ``explode`` fans out one row
    per window, ``slice``+``concat_ws``+``md5`` fingerprint the chunk
    text — a pure map-side plan with ZERO shuffles (the orderBy exists
    only for the deterministic gate compare), so at 100 TB it scales
    embarrassingly with input splits; windows never cross documents.

    Beyond-reference (no pipeline layer in the reference engine;
    cf. /root/reference/ballista/docs for scope)."""
    d = tables(spark, sf, "documents").documents.where(F.col("doc_id") < 400)
    toks = d.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("t")
    ).withColumn("n", F.size(F.col("t")))
    chunks = toks.select(
        "doc_id",
        "n",
        "t",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(_CHUNK_STRIDE)
            )
        ).alias("tok_start"),
    )
    return (
        chunks.select(
            "doc_id",
            (F.col("tok_start") / _CHUNK_STRIDE).cast("int").alias("chunk_idx"),
            "tok_start",
            F.least(
                F.col("n") - F.col("tok_start"), F.lit(_CHUNK_TOKENS)
            ).alias("n_chunk_tok"),
            _h48(
                F.concat_ws(
                    " ", F.slice(F.col("t"), F.col("tok_start") + 1, _CHUNK_TOKENS)
                )
            ).alias("chunk_h48"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# range(0, n, 96) yields the same start set as Spark's
# sequence(0, n-1, 96); list_slice clamps at the list end exactly like
# Spark's slice, so the joined chunk strings — and their folded md5
# fingerprints — are byte-identical across engines.
TRAIN_CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS t,
         len(string_split(trim(text), ' ')) AS n
  FROM documents WHERE doc_id < 400
)
SELECT doc_id,
  CAST(s // {_CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
  CAST(s AS INTEGER) AS tok_start,
  CAST(LEAST(n - s, {_CHUNK_TOKENS}) AS INTEGER) AS n_chunk_tok,
  ('0x' || substr(md5(array_to_string(
      list_slice(t, s + 1, s + {_CHUNK_TOKENS}), ' ')), 1, 12))::BIGINT
    AS chunk_h48
FROM toks, unnest(range(0, n, {_CHUNK_STRIDE})) AS u(s)
ORDER BY doc_id, chunk_idx
"""


# ---------------------------------------------------------------------------
# 8. per-language token-budget sampling (UniMax-style capped allocation)

_BUDGET_PCT = 70  # corpus-wide token budget as % of total tokens


def train_token_budget_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget sampling with per-language caps (the UniMax
    allocation, Chung et al. 2023): a corpus-wide budget (70% of total
    tokens) is split EQUALLY across languages; each language keeps docs
    until its budget is met, capped at its actual size. Dominant
    languages (en at ~43% share) get hard-capped; small ones keep
    everything — exactly the head-flattening a multilingual pretraining
    mix wants.

    Doc selection is a pure function of doc_id: keep iff
    u * tokens_lang < 1e6 * min(budget_lang, tokens_lang) where u is the
    md5-derived uniform bucket in [0, 1e6) — exact integer
    cross-multiplication, engine-identical, no RNG, stable under re-runs
    and data appends. (Overflow bound: u * tokens_lang needs
    tokens_lang < 9.2e12 per language for int64 — beyond that, scale u
    down or use a 128-bit decimal; the sandbox is ~7 orders below it.)

    Scale (100 TB): one explode-free pass computes per-doc token counts
    as a codegen expression; per-language totals are a partial-aggregated
    5-row groupBy; budgets broadcast back (5 rows); the keep decision is
    map-side. Exactly 2 shuffles (the two groupBys on lang), both tiny
    post-aggregation. Per-language budget enforcement is threshold-based
    (expected-value exact), NOT a per-language ordered scan — a window
    cumsum per language would serialize each language onto one task at
    100 TB; the threshold form is embarrassingly parallel."""
    d = tables(spark, sf, "documents").documents
    n_tok = F.size(F.filter(_tokens(F.col("text")), lambda x: x != ""))
    docs = d.select(
        "lang",
        n_tok.alias("n_tok"),
        _hash_bucket(F.col("doc_id"), 1_000_000).alias("u"),
    )
    per_lang = docs.groupBy("lang").agg(F.sum("n_tok").alias("t_lang"))
    tot = per_lang.agg(
        F.sum("t_lang").alias("t_total"), F.count(F.lit(1)).alias("n_langs")
    )
    budgets = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "t_lang",
        F.floor(
            F.col("t_total") * _BUDGET_PCT / (100 * F.col("n_langs"))
        )
        .cast("bigint")
        .alias("budget"),
    )
    keep = (
        F.col("u") * F.col("t_lang")
        < F.lit(1_000_000) * F.least(F.col("budget"), F.col("t_lang"))
    ).cast("int")
    return (
        docs.join(F.broadcast(budgets), "lang")
        .withColumn("keep", keep)
        .groupBy("lang", "t_lang", "budget")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").alias("n_kept"),
            F.sum(F.col("n_tok") * F.col("keep")).alias("tokens_kept"),
        )
        .select(
            "lang",
            "n_docs",
            F.col("t_lang").alias("tokens_total"),
            "budget",
            F.round(
                F.least(F.lit(1.0), F.col("budget") / F.col("t_lang")), 6
            ).alias("theta"),
            "n_kept",
            "tokens_kept",
        )
        .orderBy("lang")
    )


TRAIN_BUDGET_SQL = f"""
WITH docs AS (
  SELECT lang,
    len(list_filter(string_split(lower(trim(text)), ' '), x -> x <> ''))
      AS n_tok,
    {_hash_bucket_sql('doc_id', 1_000_000)} AS u
  FROM documents),
per_lang AS (SELECT lang, SUM(n_tok) AS t_lang FROM docs GROUP BY 1),
tot AS (SELECT SUM(t_lang) AS t_total, COUNT(*) AS n_langs FROM per_lang),
budgets AS (
  SELECT lang, t_lang,
    CAST(FLOOR(t_total * {_BUDGET_PCT} / (100.0 * n_langs)) AS BIGINT)
      AS budget
  FROM per_lang CROSS JOIN tot),
kept AS (
  SELECT d.lang, d.n_tok, b.t_lang, b.budget,
    CASE WHEN d.u * b.t_lang < 1000000 * LEAST(b.budget, b.t_lang)
         THEN 1 ELSE 0 END AS keep
  FROM docs d JOIN budgets b ON d.lang = b.lang)
SELECT lang, COUNT(*) AS n_docs,
  CAST(t_lang AS BIGINT) AS tokens_total, budget,
  ROUND(LEAST(1.0, CAST(budget AS DOUBLE) / t_lang), 6) AS theta,
  CAST(SUM(keep) AS BIGINT) AS n_kept,
  CAST(SUM(n_tok * keep) AS BIGINT) AS tokens_kept
FROM kept GROUP BY lang, t_lang, budget
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# 10. DSIR data selection (importance resampling toward a target domain)

_DSIR_B = 1024  # hashed n-gram feature buckets (the paper uses 10k)
_DSIR_TOPK = 200  # selection budget


def train_dsir_select(spark: SparkSession, sf: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
    score every document in the raw pool by how target-domain-like its
    hashed-unigram distribution is, and keep the top-k. The target here
    is the English slice (``lang = 'en'``) standing in for the paper's
    "formal text" target; the raw distribution is the whole corpus.

    Features are md5-hashed token buckets (engine-identical 48-bit fold,
    B=1024). Per-bucket importance weight = ln of the Laplace-smoothed
    probability ratio, quantized to integer micro-nats BEFORE the
    per-doc sum (the quality_unigram_logprob determinism discipline:
    the doc score is an exact integer sum — partition-order-independent
    — with one IEEE divide at the end). The ratio's numerator/denominator
    products are computed in double (count*total can exceed int64 at
    ~1e13 tokens; double keeps the expression scale-safe and stays
    correctly-rounded-from-exact-ints, hence engine-identical).

    Scale (100 TB): explode -> groupBy(bucket) rides partial
    aggregation into a <=B-row weight table (Zipf-hot buckets combine
    map-side); the weight table BROADCASTS back onto the token stream
    (never a shuffle on the Zipf-skewed bucket key); the per-doc sum is
    the one real shuffle (doc_id, uniform); selection is
    TakeOrderedAndProject, never a global sort. No Python anywhere."""
    d = _spread_for_explode(
        spark, tables(spark, sf, "documents").documents
    )
    toks = d.select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("tgt"),
        F.explode(_tokens(F.col("text"))).alias("tok"),
    ).where(F.col("tok") != "")
    bucketed = toks.select(
        "doc_id", "tgt", _hash_bucket(F.col("tok"), _DSIR_B).alias("b")
    )
    counts = bucketed.groupBy("b").agg(
        F.sum("tgt").alias("ct"), F.count(F.lit(1)).alias("call")
    )
    tot = counts.agg(
        F.sum("ct").alias("nt"), F.sum("call").alias("nr")
    )
    weights = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log(
                ((F.col("ct") + 1).cast("double") * (F.col("nr") + _DSIR_B))
                / ((F.col("nt") + _DSIR_B).cast("double") * (F.col("call") + 1))
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("w"),
    )
    scored = (
        bucketed.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tok"), F.sum("w").alias("sw"))
        .select(
            "doc_id",
            "n_tok",
            F.round(F.col("sw") / F.col("n_tok") / 1_000_000, 6).alias(
                "dsir_score"
            ),
        )
    )
    return scored.orderBy(
        F.desc("dsir_score"), "doc_id"
    ).limit(_DSIR_TOPK)


TRAIN_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt,
    unnest(string_split(lower(trim(text)), ' ')) AS tok
  FROM documents),
bucketed AS (
  SELECT doc_id, tgt, {_hash_bucket_sql('tok', _DSIR_B)} AS b
  FROM toks WHERE tok <> ''),
counts AS (
  SELECT b, SUM(tgt) AS ct, COUNT(*) AS call FROM bucketed GROUP BY 1),
tot AS (SELECT SUM(ct) AS nt, SUM(call) AS nr FROM counts),
weights AS (
  SELECT b,
    CAST(ROUND(ln(
      ((ct + 1)::DOUBLE * (nr + {_DSIR_B}))
      / ((nt + {_DSIR_B})::DOUBLE * (call + 1))) * 1000000) AS BIGINT) AS w
  FROM counts CROSS JOIN tot),
scored AS (
  SELECT doc_id, COUNT(*) AS n_tok,
    ROUND(SUM(w) / COUNT(*) / 1000000, 6) AS dsir_score
  FROM bucketed JOIN weights USING (b) GROUP BY doc_id)
SELECT doc_id, n_tok, dsir_score
FROM scored ORDER BY dsir_score DESC, doc_id LIMIT {_DSIR_TOPK}
"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-ES)

_WS_TOPK = 50  # sample size


def train_sample_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-proportional sampling WITHOUT replacement: the
    Efraimidis–Spirakis A-ES one-pass scheme — per doc draw a
    deterministic uniform u from a salted md5 (engine-identical), rank
    by priority u^(1/w) with w = the composite quality score, keep the
    top 50. Inclusion probability is proportional to weight, the sample
    never repeats a doc, and — unlike sequential weighted draws — the
    whole selection is embarrassingly parallel.

    Cross-engine determinism: u is an exact rational (48-bit md5 prefix
    + 1)/2^48; the priority is rounded at 9 dp before ranking with
    doc_id as tiebreak (the cosine-ranking discipline), so a final-ulp
    pow() divergence cannot reorder the sample.

    Scale (100 TB): the priority is a MAP-ONLY codegen expression; the
    selection is a global top-k = TakeOrderedAndProject (per-partition
    heaps + a k-row driver merge) — no shuffle, no sort of the corpus,
    the canonical distributed weighted sampler. Weights here come from
    _quality_expr; any per-doc weight column drops in."""
    from datafusion_ballista_spark.inventory.pipeline_text import (
        _quality_expr,
    )

    d = tables(spark, sf, "documents").documents
    # w in (0, 1]: quality clamped away from 0 so priorities stay finite
    w = F.greatest(_quality_expr(), F.lit(0.000001))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#ws"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(float(1 << 48))
    priority = F.round(F.pow(u, 1.0 / w), 9)
    return (
        d.select(
            "doc_id",
            w.alias("weight"),
            priority.alias("priority"),
        )
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(_WS_TOPK)
    )


TRAIN_WEIGHTED_SQL = f"""
WITH q AS (
  SELECT doc_id,
    greatest({{QUALITY}}, 0.000001) AS weight,
    (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#ws'), 1, 12))::BIGINT
      + 1) / {float(1 << 48)} AS u
  FROM documents)
SELECT doc_id, weight, round(pow(u, 1.0 / weight), 9) AS priority
FROM q
ORDER BY priority DESC, doc_id LIMIT {_WS_TOPK}
"""


def _train_weighted_sql() -> str:
    from datafusion_ballista_spark.inventory.pipeline_text import (
        _QUALITY_EXPR_SQL,
    )

    return TRAIN_WEIGHTED_SQL.replace("{QUALITY}", _QUALITY_EXPR_SQL)


# ---------------------------------------------------------------------------
# BPE merge learning (Sennrich et al. 2016)

_BPE_V = 200  # word types in the training table (top-V by count)
_BPE_R = 8  # merge rounds
# mirrors regexp_extract_all(word, '[a-z]') for the driver-side learner
_BPE_ALPHA_RE = re.compile(r"[a-z]")


def train_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    """Byte-pair-encoding merge learning (Sennrich et al. 2016): the
    tokenizer-training primitive of every modern LLM data pipeline.
    Seeds from the corpus word-frequency table (top-200 [a-z]+ word
    types by count, tie lexicographic), then runs 8 merge rounds: count
    adjacent symbol pairs weighted by word frequency, pick the argmax
    pair (tie: lexicographic), apply it greedily left-to-right
    non-overlapping to every word. Output: the learned merge table
    (rank, pair, merged symbol, weighted count at selection) — merges
    compose across rounds (e.g. round 6 merges 'm'+'er' built from
    round 1's 'e'+'r'), which is what makes the op genuinely iterative.

    Merge application is a PURE EXPRESSION fold (F.aggregate over the
    symbol array): append x, or replace the accumulator tail with a||b
    when (tail, x) == (a, b) — exactly the greedy non-overlap scan
    (the tail can never spuriously equal `a` post-merge since a||b
    != a for nonempty b). The DuckDB oracle replays the same 8 rounds
    with MATERIALIZED CTEs, selecting merge positions via the islands
    trick (runs of consecutive candidate positions keep even offsets);
    a python replication in tests is the third witness.

    Scale (100 TB): classic BPE trains on the WORD-FREQUENCY table,
    not the raw corpus — the corpus-wide work is ONE partial-aggregated
    word count (the only full-data shuffle); the top-V selection is
    TakeOrderedAndProject, and every round after touches only V rows
    (per-round cost independent of corpus size; V is the scale knob,
    production ~1e6). The driver holds one 3-tuple per round."""
    d = tables(spark, sf, "documents").documents
    words = (
        d.select(F.explode(_tokens(F.col("text"))).alias("w"))
        .where(F.col("w").rlike("^[a-z]+$"))
        .groupBy(F.col("w").alias("word"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(_BPE_V)
    )
    merges = _learn_bpe_merges(words)
    return spark.createDataFrame(
        merges, "rank int, a string, b string, merged string, w bigint"
    ).orderBy("rank")


def _bpe_fold(a: str, b: str, m: str, src: Column | str = "s") -> Column:
    """Greedy left-to-right non-overlapping application of one merge
    (a, b) -> m to the symbol array ``src`` (a column name or a Column
    expression, so folds CHAIN into one select): append x, or replace
    the accumulator tail with m when (tail, x) == (a, b). The tail can
    never spuriously equal ``a`` post-merge since a||b != a for
    nonempty b."""
    al, bl, ml = F.lit(a), F.lit(b), F.lit(m)
    return F.aggregate(
        src,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == al) & (x == bl),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(ml)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _learn_bpe_merges(words: DataFrame) -> list[tuple]:
    """Run the _BPE_R merge-learning rounds over a (word, cnt)
    frequency table; returns [(rank, a, b, merged, weighted_count)].

    The table is BOUNDED by construction (top-_BPE_V word types — V is
    the scale knob, independent of corpus size), so it is collected
    ONCE and the greedy loop runs driver-side in exact integer Python —
    the k-means-centroid / PQ-codebook precedent. The round-11 A/B
    motivated the switch: the previous distributed loop spent 16 tiny
    Spark jobs (8 pair-count argmaxes + 8 fold checkpoints) on a
    200-row table, pure fixed stage latency. Semantics are identical:
    pair weight = sum of word counts over adjacent symbol pairs,
    argmax tiebroken (w DESC, a ASC, b ASC), greedy left-to-right
    non-overlapping application — the same loop the DuckDB oracle
    unrolls and tests/test_curation_ops.py replicates independently."""
    v = [
        (list(_BPE_ALPHA_RE.findall(r.word)), int(r.cnt))
        for r in words.collect()
    ]
    merges = []
    for r in range(_BPE_R):
        cnt: dict[tuple[str, str], int] = {}
        for s, c in v:
            for x, y in zip(s, s[1:]):
                cnt[(x, y)] = cnt.get((x, y), 0) + c
        (a, b), wgt = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        m = a + b
        merges.append((r + 1, a, b, m, wgt))
        nv = []
        for s, c in v:
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = m
                else:
                    out.append(x)
            nv.append((out, c))
        v = nv
    return merges


def _bpe_round_sql(r: int) -> str:
    p, n = f"v{r}", f"v{r+1}"
    return f"""
sy{r} AS MATERIALIZED (
  SELECT word, cnt, generate_subscripts(s, 1) AS pos, unnest(s) AS sym
  FROM {p}),
pr{r} AS MATERIALIZED (
  SELECT word, cnt, pos, sym,
    lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM sy{r}),
mr{r} AS MATERIALIZED (
  SELECT sym AS a, nxt AS b, CAST(SUM(cnt) AS BIGINT) AS w
  FROM pr{r} WHERE nxt IS NOT NULL
  GROUP BY 1, 2 ORDER BY w DESC, a, b LIMIT 1),
sl{r} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos,
      pos - MIN(pos) OVER (PARTITION BY word, grp) AS off
    FROM (SELECT word, pos,
            pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
          FROM (SELECT p.word, p.pos FROM pr{r} p, mr{r} m
                WHERE p.sym = m.a AND p.nxt = m.b)))
  WHERE off % 2 = 0),
{n} AS MATERIALIZED (
  SELECT sy.word, ANY_VALUE(sy.cnt) AS cnt,
    list(CASE WHEN m.pos IS NOT NULL THEN sy.sym || mr.b ELSE sy.sym END
         ORDER BY sy.pos) AS s
  FROM sy{r} sy
  CROSS JOIN mr{r} mr
  LEFT JOIN sl{r} m ON m.word = sy.word AND m.pos = sy.pos
  LEFT JOIN sl{r} m2 ON m2.word = sy.word AND m2.pos = sy.pos - 1
  WHERE m2.pos IS NULL
  GROUP BY sy.word)"""


TRAIN_BPE_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(lower(trim(text)), ' ')) AS w FROM documents),
words AS MATERIALIZED (
  SELECT w AS word, COUNT(*) AS cnt FROM toks
  WHERE regexp_matches(w, '^[a-z]+$') GROUP BY 1
  ORDER BY cnt DESC, word LIMIT {_BPE_V}),
v0 AS MATERIALIZED (
  SELECT word, cnt, regexp_extract_all(word, '[a-z]') AS s FROM words),
{",".join(_bpe_round_sql(r) for r in range(_BPE_R))}
SELECT * FROM (
{" UNION ALL ".join(f"SELECT {r + 1} AS rank, a, b, a || b AS merged, w FROM mr{r}" for r in range(_BPE_R))}
) ORDER BY rank
"""


# ---------------------------------------------------------------------------
# 11b. BPE tokenization — apply the learned merges to the whole corpus


def train_bpe_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus tokenization with the learned BPE merge table: the
    counterpart of train_bpe_merges (same learning loop, shared code)
    that then APPLIES the 8 merges to every word occurrence and reports
    per-source compression — words, BPE tokens, chars, and the
    chars-per-token ratio in exact integer micro-units (no floating
    point, so the output is bit-reproducible across engines).

    The application is memoized the way production tokenizers amortize:
    encode each DISTINCT word type ONCE (8 map-only expression folds
    over the word-type table), then join the per-(source, word)
    occurrence counts back to the encoded lengths. The corpus-scale work
    is exactly TWO shuffles — the (source, word) count groupBy and the
    final per-source aggregate; the join-back keys on word types, whose
    cardinality is corpus-sublinear (Heaps' law).

    Scale (100 TB): raw-corpus passes are the occurrence count (one
    partial-aggregated shuffle) and nothing else; merge learning touches
    only the top-V frequency table (V is the scale knob); encoding
    touches only word TYPES. The DuckDB oracle replays learning AND
    application with the same unrolled-islands CTEs as TRAIN_BPE_SQL —
    16 MATERIALIZED rounds total (8 learn + 8 apply)."""
    d = _spread_for_explode(spark, tables(spark, sf, "documents").documents)
    occ = (
        d.select("source", F.explode(_tokens(F.col("text"))).alias("w"))
        .where(F.col("w").rlike("^[a-z]+$"))
        .groupBy("source", F.col("w").alias("word"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)  # reused: learning input + join-back
    )
    words = (
        occ.groupBy("word")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(_BPE_V)
    )
    merges = _learn_bpe_merges(words)
    # All 8 merge applications run in ONE Arrow-vectorized kernel over
    # the word-type table (round 14, guide §4.2; replaces the 8 chained
    # F.aggregate folds, whose higher-order lambdas evaluate in the
    # INTERPRETED expression path per array element — the r13-measured
    # encode-stage floor). The kernel exploits an exact equivalence:
    # render the symbol sequence as ",s1,,s2,,...,sN," (every symbol
    # wrapped in its own commas — symbols are [a-z]+ so ',' never occurs
    # inside one); then greedy left-to-right non-overlapping application
    # of one merge (a, b) -> ab IS C-speed str.replace of ",a,,b," with
    # ",ab,": a match must align on full-symbol boundaries (each symbol
    # carries its own commas, so neither a suffix like "xa" nor a split
    # across boundaries can match), consecutive matches share no
    # characters (adjacent symbols are separated by TWO commas, one per
    # side), and str.replace resumes after the substituted text exactly
    # like the fold, whose accumulator tail a||b can never re-match `a`
    # for nonempty b. tok_len = count(",,") + 1. Bit-identity
    # fold-vs-kernel incl. the boundary hazards is pinned in
    # tests/test_curation_ops.py; the 8 tiny driver-side learning jobs
    # above are unchanged. The kernel still runs ONCE per word TYPE,
    # never per occurrence (the Heaps'-law memoization).
    merge_pairs = [(f",{a},,{b},", f",{a + b},") for _, a, b, _m, _w in merges]

    @pandas_udf("int")
    def _tok_len(ws):
        import pandas as pd

        # word matched ^[a-z]+$ upstream, so its char list IS the
        # initial symbol sequence (the fold's regexp_extract_all).
        s = pd.Series(["," + ",,".join(w) + "," for w in ws], dtype="object")
        for pat, rep in merge_pairs:
            s = s.str.replace(pat, rep, regex=False)
        return (s.str.count(",,") + 1).astype("int32")

    enc = (
        occ.select("word")
        .distinct()
        .select("word", _tok_len(F.col("word")).alias("tok_len"))
    )
    return (
        occ.join(enc, "word")
        .groupBy("source")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.sum(F.col("cnt") * F.col("tok_len")).alias("n_tokens"),
            F.sum(F.col("cnt") * F.length("word")).alias("n_chars"),
        )
        .select(
            "source",
            "n_words",
            "n_tokens",
            "n_chars",
            # ppm numerator in DECIMAL(38,0): n_chars * 1e6 blows past
            # int64 once a source exceeds ~9e12 chars (~9 TB of text),
            # well inside the 100 TB target — Spark (ANSI off) would
            # wrap silently while the DuckDB oracle raises. DECIMAL DIV
            # keeps the quotient exact; the oracle mirrors via HUGEINT.
            F.expr(
                "CAST((CAST(n_chars AS DECIMAL(38,0)) * 1000000)"
                " DIV n_tokens AS BIGINT)"
            ).alias("chars_per_token_ppm"),
        )
        .orderBy("source")
    )


def _bpe_apply_sql(r: int) -> str:
    """One oracle application round: greedily apply the round-r learned
    merge (the 1-row mr{r} table from TRAIN_BPE_SQL's learning rounds)
    to the full word-type table a{r}, via the same islands trick."""
    p, n = f"a{r}", f"a{r+1}"
    return f"""
asy{r} AS MATERIALIZED (
  SELECT word, generate_subscripts(s, 1) AS pos, unnest(s) AS sym
  FROM {p}),
apr{r} AS MATERIALIZED (
  SELECT word, pos, sym,
    lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM asy{r}),
asl{r} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos,
      pos - MIN(pos) OVER (PARTITION BY word, grp) AS off
    FROM (SELECT word, pos,
            pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
          FROM (SELECT p.word, p.pos FROM apr{r} p, mr{r} m
                WHERE p.sym = m.a AND p.nxt = m.b)))
  WHERE off % 2 = 0),
{n} AS MATERIALIZED (
  SELECT sy.word,
    list(CASE WHEN m.pos IS NOT NULL THEN sy.sym || mr.b ELSE sy.sym END
         ORDER BY sy.pos) AS s
  FROM asy{r} sy
  CROSS JOIN mr{r} mr
  LEFT JOIN asl{r} m ON m.word = sy.word AND m.pos = sy.pos
  LEFT JOIN asl{r} m2 ON m2.word = sy.word AND m2.pos = sy.pos - 1
  WHERE m2.pos IS NULL
  GROUP BY sy.word)"""


TRAIN_BPE_ENCODE_SQL = f"""
WITH toks AS (
  SELECT source, unnest(string_split(lower(trim(text)), ' ')) AS w
  FROM documents),
occ AS MATERIALIZED (
  SELECT source, w AS word, COUNT(*) AS cnt FROM toks
  WHERE regexp_matches(w, '^[a-z]+$') GROUP BY 1, 2),
words AS MATERIALIZED (
  SELECT word, CAST(SUM(cnt) AS BIGINT) AS cnt FROM occ GROUP BY 1
  ORDER BY cnt DESC, word LIMIT {_BPE_V}),
v0 AS MATERIALIZED (
  SELECT word, cnt, regexp_extract_all(word, '[a-z]') AS s FROM words),
{",".join(_bpe_round_sql(r) for r in range(_BPE_R))},
a0 AS MATERIALIZED (
  SELECT DISTINCT word, regexp_extract_all(word, '[a-z]') AS s FROM occ),
{",".join(_bpe_apply_sql(r) for r in range(_BPE_R))},
enc AS MATERIALIZED (
  SELECT word, len(s) AS tok_len FROM a{_BPE_R})
SELECT occ.source,
  CAST(SUM(cnt) AS BIGINT) AS n_words,
  CAST(SUM(cnt * tok_len) AS BIGINT) AS n_tokens,
  CAST(SUM(cnt * length(word)) AS BIGINT) AS n_chars,
  CAST((CAST(SUM(cnt * length(word)) AS HUGEINT) * 1000000)
       // CAST(SUM(cnt * tok_len) AS BIGINT) AS BIGINT)
    AS chars_per_token_ppm
FROM occ JOIN enc USING (word)
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# 12. curriculum ordering — easy-to-hard schedule with in-tier shuffle


def train_curriculum_order(spark: SparkSession, sf: str) -> DataFrame:
    """Curriculum-learning order (Bengio et al. 2009 re-expressed
    relationally): score each doc's difficulty map-side, cut the corpus
    into 10 exact difficulty deciles, and emit a global training order
    that walks the deciles easy->hard with a deterministic md5 shuffle
    INSIDE each decile (so a tier is not consumed in difficulty order —
    the standard curriculum recipe of tiered phases + in-phase shuffle).

    Difficulty = mean token length in exact integer micro-units
    (chars*1e6 DIV tokens — no floating point, so decile boundaries are
    bit-reproducible across engines and re-runs). Deciles are computed
    from the global difficulty rank, not approximate quantiles, via the
    distributed no-PARTITION-BY row_number (operators/global_window.py:
    range-repartition + per-partition rank + broadcast offset stitch).

    Scale (100 TB): two range-partitioned sorts (the decile rank and the
    final order) + one map-only scoring pass; the driver holds one
    per-partition count list per sort, never rows. No single-partition
    window anywhere — this is exactly the workload class the
    global-window family exists for (reference analogue:
    ballista's partitioned window exec over unbounded partitions)."""
    from datafusion_ballista_spark.operators.global_window import (
        global_row_number,
    )

    d = _spread_for_explode(spark, tables(spark, sf, "documents").documents)
    scored = d.select(
        "doc_id",
        F.expr(
            "CAST((length(replace(lower(trim(text)), ' ', '')) * 1000000)"
            " DIV size(split(lower(trim(text)), ' ')) AS BIGINT)"
        ).alias("difficulty"),
    )
    n = scored.count()  # one scalar of driver metadata (decile divisor)
    # NULLS LAST pinned explicitly on BOTH sides: Spark's asc() defaults
    # NULLS FIRST while DuckDB's row_number ORDER BY defaults NULLS
    # LAST — a NULL-text doc (NULL difficulty) would silently shift
    # every rank/decile between engines otherwise.
    ranked = global_row_number(
        scored, [F.asc_nulls_last("difficulty"), F.asc("doc_id")], out_col="rn"
    )
    tiers = ranked.select(
        "doc_id",
        "difficulty",
        F.expr(f"CAST(((rn - 1) * 10) DIV {n} AS INT)").alias("decile"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        .alias("shuf"),
    )
    return (
        global_row_number(
            tiers,
            [F.asc("decile"), F.asc("shuf"), F.asc("doc_id")],
            out_col="curriculum_pos",
        )
        .select("doc_id", "difficulty", "decile", "curriculum_pos")
        .orderBy("curriculum_pos")
    )


TRAIN_CURRICULUM_SQL = """
WITH s AS (
  SELECT doc_id,
    CAST((length(replace(lower(trim(text)), ' ', '')) * 1000000)
         // len(string_split(lower(trim(text)), ' ')) AS BIGINT)
      AS difficulty
  FROM documents),
r AS (
  SELECT doc_id, difficulty,
    row_number() OVER (ORDER BY difficulty NULLS LAST, doc_id) AS rn,
    COUNT(*) OVER () AS n
  FROM s),
tiers AS (
  SELECT doc_id, difficulty,
    CAST(((rn - 1) * 10) // n AS INT) AS decile,
    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS shuf
  FROM r)
SELECT doc_id, difficulty, decile,
  row_number() OVER (ORDER BY decile, shuf, doc_id) AS curriculum_pos
FROM tiers
ORDER BY curriculum_pos
"""


# ---------------------------------------------------------------------------
# Bloom-filter decontamination pre-screen (Bloom 1970; the production
# front end to the exact train_contamination_ngram join)

_BLOOM_BITS = 1 << 16  # m: bitmap size (8 KiB as 1024 int64 words)
_BLOOM_K = 3  # hash functions per element


def _bloom_pos_spark_sql(s: str, j: int) -> str:
    """Bit position j for shingle-hash column s, as a Spark-SQL string:
    md5 of "s:j" folded to 48 bits mod m. SINGLE source of truth for
    the Spark side — both the bitmap BUILD (via _bloom_pos_col) and the
    map-only PROBE (via _bit_sql) derive from this template (round-9
    ADVICE: a third hand-inlined copy could drift, building the bitmap
    with one hash and probing with another — false negatives the 'no
    false negatives' property relies on excluding)."""
    return (
        f"(cast(conv(substring(md5(concat(cast({s} as string), ':{j}')), "
        f"1, 12), 16, 10) as bigint) % {_BLOOM_BITS})"
    )


def _bloom_pos_col(s: str, j: int) -> Column:
    return F.expr(_bloom_pos_spark_sql(s, j))


def _bloom_pos_sql(s: str, j: int) -> str:
    return (
        f"(('0x' || substr(md5(CAST({s} AS VARCHAR) || ':{j}'), 1, 12))"
        f"::BIGINT % {_BLOOM_BITS})"
    )


def train_contamination_bloom(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter decontamination pre-screen: the benchmark side's
    shingles are folded into an 8 KiB bitmap (m = 2^16 bits, k = 3
    md5-salted hashes) that ships to every task as 1024 int64 plan
    literals; each training shingle probes the bitmap MAP-ONLY, and
    only bloom-positive shingles reach the exact membership join. This
    is the production front end to train_contamination_ngram's exact
    screen — at 100 TB the benchmark suite is megabytes (a bounded
    bitmap) while the corpus is not, so the exact join's probe side
    shrinks from every shingle occurrence to the bloom-positive sliver,
    at zero recall loss (Bloom filters have no false negatives; false
    positives are killed by the exact join and REPORTED here as the
    bloom_fp funnel column). Output: per training doc with >= 1 bloom
    hit — shingle totals, bloom hits, exact hits, and the contaminated
    verdict (identical to the exact screen's by construction).

    Determinism: the bitmap is a pure function of md5 over exact
    integers; both engines replay membership identically (the oracle
    probes the same positions against the same set-bit list). The
    driver-side collect is the set-bit position list — bounded by m =
    65536 ints (512 KiB) regardless of corpus or benchmark size, the
    centroid-collect precedent.

    Scale (100 TB): bench shingle distinct = one partial-agg shuffle
    over the BOUNDED bench side; corpus probe is map-only expression
    work (6 md5 folds + 3 array lookups per shingle); the exact join
    shuffles only bloom-positive shingles; one doc_id rollup.

    Sizing: m = 2^16 matches the fixture benchmark (hundreds of
    shingles -> FP ~ 4e-5). m must scale with the REAL suite (~1%
    FP at n elements needs m ~ 14n bits; a saturated bitmap stays
    CORRECT — zero false negatives, the exact join still decides —
    it just stops pruning, which is what the recorded bloom_fp column
    makes visible, e.g. at the sf1 stress scale where the synthetic
    bench side outgrows 2^16). Past plan-literal comfort (~2^20 bits)
    ship the words as a broadcast variable instead; the probe
    expression is unchanged."""
    d = _spread_for_explode(spark, tables(spark, sf, "documents").documents)
    arr = _tokens(F.col("text"))
    ex = (
        d.where(F.size(arr) >= 3)
        .select("doc_id", F.explode(_shingles(arr)).alias("s"))
        .select("doc_id", _h48(F.col("s")).alias("s"))
    )
    bench = ex.where(F.col("doc_id") % 97 == 0).select("s").distinct()
    # build the bitmap driver-side from the bounded set-bit positions
    pos_rows = (
        bench.select(
            F.explode(
                F.array(
                    *[_bloom_pos_col("s", j) for j in range(_BLOOM_K)]
                )
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * (_BLOOM_BITS // 64)
    for r in pos_rows:
        words[r.p // 64] |= 1 << (r.p % 64)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]  # signed
    wlit = F.array(*[F.lit(w).cast("bigint") for w in words])
    train = ex.where(F.col("doc_id") % 97 != 0)

    def _bit_sql(j: int) -> str:
        # probe-side position comes from the SAME template the bitmap
        # was built with — no third hand-written hash copy
        pos = _bloom_pos_spark_sql("s", j)
        # signed-safe bit extract: arithmetic shiftright preserves bit b
        # at position 0 for every b in [0, 63], including the sign bit
        return (
            f"((shiftright(element_at(__bw, cast({pos} div 64 as int) + 1), "
            f"cast({pos} % 64 as int)) & 1) = 1)"
        )

    probed = train.withColumn("__bw", wlit).select(
        "doc_id",
        "s",
        *[F.expr(_bit_sql(j)).alias(f"b{j}") for j in range(_BLOOM_K)],
    )
    hit = probed.withColumn(
        "bloom_hit", F.col("b0") & F.col("b1") & F.col("b2")
    )
    exact = (
        hit.where(F.col("bloom_hit"))
        .join(bench.withColumnRenamed("s", "bs"),
              F.col("s") == F.col("bs"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bloom_hits"),
            F.sum(F.when(F.col("bs").isNotNull(), 1).otherwise(0)).alias(
                "n_exact"
            ),
        )
    )
    totals = hit.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        totals.join(exact, "doc_id")
        .select(
            "doc_id",
            "n_shingles",
            "n_bloom_hits",
            "n_exact",
            (F.col("n_bloom_hits") - F.col("n_exact")).alias("bloom_fp"),
            (F.col("n_exact") > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def _bloom_oracle_sql() -> str:
    probes = " AND ".join(
        f"{_bloom_pos_sql('t.s', j)} IN (SELECT p FROM positions)"
        for j in range(_BLOOM_K)
    )
    poses = ", ".join(_bloom_pos_sql("s", j) for j in range(_BLOOM_K))
    return f"""
WITH docs AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS arr FROM documents
  WHERE len(string_split(lower(trim(text)), ' ')) >= 3),
ex AS (
  SELECT doc_id,
    ('0x' || substr(md5(s), 1, 12))::BIGINT AS s
  FROM (SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, len(arr) - 1),
          i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]))) AS s
        FROM docs)),
bench AS (SELECT DISTINCT s FROM ex WHERE doc_id % 97 = 0),
positions AS (
  SELECT DISTINCT p FROM (SELECT unnest([{poses}]) AS p FROM bench)),
train AS (SELECT doc_id, s FROM ex WHERE doc_id % 97 <> 0),
hit AS (
  SELECT t.doc_id, t.s, ({probes}) AS bloom_hit
  FROM train t),
exact AS (
  SELECT h.doc_id, COUNT(*) AS n_bloom_hits,
    CAST(SUM(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_exact
  FROM hit h LEFT JOIN bench b USING (s)
  WHERE h.bloom_hit GROUP BY 1),
totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM hit GROUP BY 1)
SELECT doc_id, n_shingles, n_bloom_hits, n_exact,
  n_bloom_hits - n_exact AS bloom_fp,
  n_exact > 0 AS contaminated
FROM totals JOIN exact USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# concat-and-chunk packing (the GPT-pretraining fixed-window shape)

_CHUNK_C = 256  # tokens per fixed training window


def train_pack_concat_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-and-chunk packing — the OTHER packing discipline next to
    train_seq_packing's shard-local no-split bins: GPT-style
    pretraining concatenates the whole corpus in a fixed order and
    slices fixed windows of C=256 tokens, SPLITTING documents across
    window boundaries. Each doc's global token offset comes from the
    distributed no-PARTITION-BY running sum (operators/global_window
    .global_running_sum: range shuffle + per-partition cumsum + bounded
    offset stitch — never one unsplittable window task); each doc then
    emits one row per window it overlaps, and the per-window rollup
    reports docs touched, docs STARTING there (boundary density), and
    the exact token occupancy — which must be exactly C everywhere but
    the tail, pinned by test. The fragmentation statistics are what a
    data engineer reads before picking C (how many attention windows
    open mid-document).

    Scale (100 TB): token counting is map-only; ONE range shuffle for
    the global cumsum (offsets are per-partition metadata); the span
    explode amplifies each doc by ceil(len/C) <= len rows feeding a
    window-id partial agg. No Python anywhere."""
    d = tables(spark, sf, "documents").documents
    sz = d.select(
        "doc_id",
        F.size(
            F.filter(_tokens(F.col("text")), lambda x: x != "")
        ).cast("bigint").alias("len"),
    ).where(F.col("len") >= 1)
    from datafusion_ballista_spark.operators import global_running_sum

    cum = global_running_sum(
        sz, [F.asc("doc_id")], F.col("len"), out_col="cume"
    )
    spans = cum.select(
        "doc_id",
        "len",
        (F.col("cume") - F.col("len")).alias("off"),
    ).select(
        "doc_id",
        "len",
        "off",
        F.expr(f"off div {_CHUNK_C}").alias("c0"),
        F.expr(f"(off + len - 1) div {_CHUNK_C}").alias("c1"),
    )
    ex = spans.select(
        "doc_id",
        "len",
        "off",
        F.explode(F.sequence(F.col("c0"), F.col("c1"))).alias("chunk_id"),
    )
    return (
        ex.groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    F.expr(f"off div {_CHUNK_C}") == F.col("chunk_id"), 1
                ).otherwise(0)
            ).alias("n_starts"),
            F.sum(
                F.expr(
                    f"LEAST(off + len, (chunk_id + 1) * {_CHUNK_C})"
                    f" - GREATEST(off, chunk_id * {_CHUNK_C})"
                )
            ).alias("n_tokens"),
        )
        .orderBy("chunk_id")
    )


TRAIN_CONCAT_CHUNKS_SQL = f"""
WITH sz AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split(lower(trim(text)), ' '),
                         x -> x <> '')) AS BIGINT) AS l
  FROM documents),
cum AS (
  SELECT doc_id, l,
    SUM(l) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume
  FROM sz WHERE l >= 1),
spans AS (SELECT doc_id, l, CAST(cume - l AS BIGINT) AS off FROM cum),
ex AS (
  SELECT doc_id, l, off,
    unnest(range(off // {_CHUNK_C}, (off + l - 1) // {_CHUNK_C} + 1))
      AS chunk_id
  FROM spans)
SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
  COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN off // {_CHUNK_C} = chunk_id THEN 1 ELSE 0 END)
       AS BIGINT) AS n_starts,
  CAST(SUM(LEAST(off + l, (chunk_id + 1) * {_CHUNK_C})
           - GREATEST(off, chunk_id * {_CHUNK_C})) AS BIGINT) AS n_tokens
FROM ex GROUP BY 1 ORDER BY 1
"""


_PRIO_K = 64  # priority-sample size
# u-granularity: u = h/2^32, so q = w*2^32 div h = floor(w/u) is the
# DLT priority ALREADY in weight units (flooring biases tau down by
# < 1 char — noise next to the sqrt(1/k) sampling error).
_PRIO_SCALE = 1 << 32


def train_priority_sample_sum(spark: SparkSession, sf: str) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM 2007): one pass
    draws a k=64 weighted-without-replacement sample of documents
    (weight = n_chars) AND turns it into an UNBIASED estimator of the
    corpus's total character count — the "how many tokens does this
    slice hold" question every mixture planner asks, answered from a
    bounded sample instead of a full scan.

    Construction: priority q_i = w_i / u_i with u_i uniform; keep the
    top k by q; let tau = the (k+1)-th priority; each kept item
    estimates its stratum as max(w_i, tau), and sum(max(w_i, tau)) is
    unbiased for sum(w) (the paper's Thm 1 — within a factor tied to
    k of the best possible variance for ANY k-sparse sum estimator).

    Unlike train_sample_weighted (A-ES, float pow priorities rounded
    before ranking), the priority here is an EXACT INTEGER: u = h/2^32
    from a 32-bit md5 fold, so q = w * 2^32 div h — floor division on
    int64 on both engines, no float anywhere until the final err_ppm
    report. A last-ulp divergence is structurally impossible.

    Scale (100 TB): priorities are map-only codegen; top-(k+1) is
    TakeOrderedAndProject (per-partition heaps, k-row merge,
    communication independent of N); tau and the estimate fold inside
    a k-row plan fragment — no collect. The exact-total witness is one
    map-side-combining agg and exists only to ground err_ppm.
    w * 2^32 stays in int64 up to w ~ 2e9 chars per doc (far past any
    real document; past it, drop to a 24-bit fold or DECIMAL)."""
    d = tables(spark, sf, "documents").documents
    q = d.select(
        "doc_id",
        F.col("n_chars").alias("w"),
        F.expr(
            "(n_chars * 4294967296) div "
            "(cast(conv(substring(md5(concat(cast(doc_id as string), "
            "'#ps')), 1, 8), 16, 10) as bigint) + 1)"
        ).alias("q"),
    )
    top = q.orderBy(F.desc("q"), F.asc("doc_id")).limit(_PRIO_K + 1)
    tau = top.agg(F.min("q").alias("tau"))  # the (k+1)-th priority
    exact = d.agg(F.sum("n_chars").alias("exact_total"))
    kept = (
        top.crossJoin(F.broadcast(tau))
        .where(F.col("q") > F.col("tau"))
        .crossJoin(F.broadcast(exact))
    )
    est = F.sum(
        F.greatest(F.col("w").cast("double"), F.col("tau").cast("double"))
    ).alias("est_total")
    return (
        kept.groupBy("exact_total")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.round(est, 4).alias("est_total"),
        )
        .select(
            "k",
            "est_total",
            "exact_total",
            F.expr(
                "cast(round((est_total - exact_total) / exact_total "
                "* 1000000) as bigint)"
            ).alias("err_ppm"),
        )
    )


TRAIN_PRIORITY_SQL = f"""
WITH p AS (
  SELECT doc_id, n_chars AS w,
    (n_chars * {_PRIO_SCALE}) //
      (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#ps'), 1, 8))::BIGINT
       + 1) AS q
  FROM documents),
top AS (SELECT * FROM p ORDER BY q DESC, doc_id LIMIT {_PRIO_K + 1}),
tau AS (SELECT MIN(q) AS tau FROM top),
ex AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS exact_total FROM documents),
kept AS (
  SELECT w, t.tau, exact_total FROM top CROSS JOIN tau t CROSS JOIN ex
  WHERE q > t.tau),
agg AS (
  SELECT exact_total, COUNT(*) AS k,
    ROUND(SUM(GREATEST(w::DOUBLE, tau::DOUBLE)), 4) AS est_total
  FROM kept GROUP BY exact_total)
SELECT k, est_total, exact_total,
  CAST(ROUND((est_total - exact_total) / exact_total * 1000000) AS BIGINT)
    AS err_ppm
FROM agg
"""


_SHUF_EPOCHS = 3
_SHUF_SHARDS = 8


def train_epoch_shuffle_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic epoch shuffling + shard assignment — the "give
    every training epoch a fresh, reproducible global order without a
    global sort" primitive: for each epoch e, every doc gets a 48-bit
    md5(e, doc_id) position; shard = position mod S. Re-running epoch e
    yields the identical order on any cluster size; no rand(), no
    seed-state, no driver coordination.

    Output is the per-(epoch, shard) manifest a dataloader consumes:
    row count, doc_id checksum, position span, and the signed deviation
    of the shard's share from the ideal 1/S (ppm) — the balance
    evidence that the hash is doing its job epoch over epoch.

    Scale (100 TB): position + shard are MAP-ONLY codegen expressions;
    the only shuffle is the final E*S=24-group aggregate (map-side
    combining, communication independent of N). A real loader then
    range-partitions each shard by position — a single shuffle whose
    balance this manifest certifies BEFORE paying for it. All integer
    math; sum_doc_id stays exact in DECIMAL(38,0) at any corpus."""
    d = tables(spark, sf, "documents").documents
    e = d.select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(i) for i in range(_SHUF_EPOCHS)])
        ).alias("epoch"),
    ).select(
        "doc_id",
        "epoch",
        F.expr(
            "cast(conv(substring(md5(concat_ws(':', epoch, doc_id, 'sh')), "
            "1, 12), 16, 10) as bigint)"
        ).alias("pos"),
    )
    nn = d.agg(F.count(F.lit(1)).alias("n"))  # 1-row broadcast witness
    return (
        e.groupBy(
            "epoch", (F.col("pos") % _SHUF_SHARDS).cast("int").alias("shard")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("doc_id").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("sum_doc_id"),
            F.min("pos").alias("min_pos"),
            F.max("pos").alias("max_pos"),
        )
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("epoch").cast("int").alias("epoch"),
            "shard",
            "n_docs",
            "sum_doc_id",
            "min_pos",
            "max_pos",
            F.expr(
                f"cast(n_docs * 1000000 div n "
                f"- {1_000_000 // _SHUF_SHARDS} as bigint)"
            ).alias("dev_ppm"),
        )
        .orderBy("epoch", "shard")
    )


TRAIN_SHUFFLE_SQL = f"""
WITH e AS (
  SELECT doc_id, CAST(t.epoch AS INTEGER) AS epoch,
    ('0x' || substr(md5(t.epoch || ':' || doc_id || ':' || 'sh'),
     1, 12))::BIGINT AS pos
  FROM documents CROSS JOIN range(0, {_SHUF_EPOCHS}) t(epoch)),
nn AS (SELECT COUNT(*) AS n FROM documents)
SELECT epoch, CAST(pos % {_SHUF_SHARDS} AS INTEGER) AS shard,
  COUNT(*) AS n_docs,
  CAST(SUM(doc_id::HUGEINT) AS BIGINT) AS sum_doc_id,
  MIN(pos) AS min_pos, MAX(pos) AS max_pos,
  CAST(COUNT(*) * 1000000 // (SELECT n FROM nn)
       - {1_000_000 // _SHUF_SHARDS} AS BIGINT) AS dev_ppm
FROM e
GROUP BY 1, 2
ORDER BY epoch, shard
"""


_BFD_BUDGET = 512  # token budget per packed sequence (no-split bins)

# DuckDB replay of the BFD fold (round 12 — closes the last fixable
# `no_oracle` row). Best-fit-decreasing over the deterministic
# (n_tok DESC, doc_id) order is a sequential fold, so it IS
# SQL-expressible with WITH RECURSIVE carrying the per-shard bin loads
# as a LIST (the dedup_keep_best / _bpe_round_sql precedent): each step
# places item k of every shard at once — "fullest bin that still fits"
# = first occurrence (list_position) of the max eligible load, exactly
# the Python loop's strict `>` tie-break. Item sequences are
# pre-aggregated per shard into LISTs inside a MATERIALIZED CTE so a
# step is an 8-row join + O(1) list index — without the hint DuckDB
# re-tokenizes every document per iteration and the oracle goes
# quadratic (A/B at 10k docs: 116 s -> 2.6 s). Next-fit over arrival
# order rides the same recursion as (nf_bins, cur) scalars.
TRAIN_BFD_SQL = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, doc_id % {_NSHARDS} AS shard,
         len(string_split(trim(text), ' ')) AS n_tok
  FROM documents),
shard_items AS MATERIALIZED (
  SELECT s.shard,
         COALESCE(f.its_bfd, CAST([] AS BIGINT[])) AS its_bfd,
         COALESCE(f.its_arr, CAST([] AS BIGINT[])) AS its_arr,
         COALESCE(f.n, 0) AS n
  FROM (SELECT DISTINCT shard FROM toks) s
  LEFT JOIN (
    SELECT shard,
           list(n_tok ORDER BY n_tok DESC, doc_id) AS its_bfd,
           list(n_tok ORDER BY doc_id) AS its_arr,
           COUNT(*) AS n
    FROM toks WHERE n_tok <= {_BFD_BUDGET} GROUP BY shard) f USING (shard)),
depth AS MATERIALIZED (SELECT MAX(n) AS mx FROM shard_items),
pack AS (
  SELECT shard, 0 AS step, CAST([] AS BIGINT[]) AS loads,
         CAST(0 AS BIGINT) AS nf_bins,
         CAST({_BFD_BUDGET + 1} AS BIGINT) AS cur
  FROM shard_items
  UNION ALL
  SELECT s.shard, s.step + 1,
    CASE
      WHEN it.its_bfd[s.step + 1] IS NULL THEN s.loads
      WHEN len(list_filter(s.loads,
             l -> l + it.its_bfd[s.step + 1] <= {_BFD_BUDGET})) = 0
        THEN list_append(s.loads, it.its_bfd[s.step + 1])
      ELSE list_concat(list_concat(
             s.loads[1 : list_position(s.loads,
               list_aggregate(list_filter(s.loads,
                 l -> l + it.its_bfd[s.step + 1] <= {_BFD_BUDGET}),
                 'max')) - 1],
             [list_aggregate(list_filter(s.loads,
                l -> l + it.its_bfd[s.step + 1] <= {_BFD_BUDGET}), 'max')
              + it.its_bfd[s.step + 1]]),
             list_slice(s.loads,
               list_position(s.loads,
                 list_aggregate(list_filter(s.loads,
                   l -> l + it.its_bfd[s.step + 1] <= {_BFD_BUDGET}),
                   'max')) + 1,
               len(s.loads)))
    END AS loads,
    CASE WHEN it.its_arr[s.step + 1] IS NULL THEN s.nf_bins
         WHEN s.cur + it.its_arr[s.step + 1] > {_BFD_BUDGET}
           THEN s.nf_bins + 1
         ELSE s.nf_bins END AS nf_bins,
    CASE WHEN it.its_arr[s.step + 1] IS NULL THEN s.cur
         WHEN s.cur + it.its_arr[s.step + 1] > {_BFD_BUDGET}
           THEN it.its_arr[s.step + 1]
         ELSE s.cur + it.its_arr[s.step + 1] END AS cur
  FROM pack s JOIN shard_items it USING (shard)
  WHERE s.step < (SELECT mx FROM depth)),
final AS (
  SELECT shard, loads, nf_bins FROM pack
  WHERE step = (SELECT mx FROM depth)),
stats AS (
  SELECT shard,
    SUM(CASE WHEN n_tok <= {_BFD_BUDGET} THEN 1 ELSE 0 END) AS n_docs,
    SUM(CASE WHEN n_tok > {_BFD_BUDGET} THEN 1 ELSE 0 END) AS n_oversize,
    SUM(CASE WHEN n_tok <= {_BFD_BUDGET} THEN n_tok ELSE 0 END)
      AS total_tokens
  FROM toks GROUP BY shard)
SELECT CAST(st.shard AS INTEGER) AS shard,
  CAST(st.n_docs AS BIGINT) AS n_docs,
  CAST(st.n_oversize AS BIGINT) AS n_oversize,
  CAST(st.total_tokens AS BIGINT) AS total_tokens,
  CAST(len(f.loads) AS BIGINT) AS bins_bfd,
  CAST(f.nf_bins AS BIGINT) AS bins_nextfit,
  CAST(CASE WHEN st.total_tokens = 0 THEN 0
       ELSE (st.total_tokens + {_BFD_BUDGET - 1}) // {_BFD_BUDGET}
       END AS BIGINT) AS bins_lower_bound,
  CAST(CASE WHEN len(f.loads) = 0 THEN 0
       ELSE list_aggregate(f.loads, 'max') END AS BIGINT) AS max_bin_tokens,
  CAST(CASE WHEN len(f.loads) = 0 THEN 0
       ELSE (len(f.loads) * {_BFD_BUDGET} - st.total_tokens) * 1000000
            // (len(f.loads) * {_BFD_BUDGET})
       END AS BIGINT) AS waste_ppm
FROM stats st JOIN final f USING (shard)
ORDER BY shard
"""


def train_pack_bestfit(spark: SparkSession, sf: str) -> DataFrame:
    """Best-fit-decreasing sequence packing — the no-split bin packer
    (Johnson 1973 FFD/BFD family; the packing step in e.g. the T5 /
    'fewer truncations improve language modeling' pipelines): within a
    shard, docs are sorted by (tokens desc, doc_id) and each is placed
    in the fullest bin that still fits it, opening a new bin otherwise.
    BFD guarantees <= 11/9 OPT + 1 bins; the output reports, per shard,
    the bin count and waste against BOTH the lower bound
    ceil(total/budget) and the naive arrival-order next-fit packing the
    streaming variant (train_seq_packing) would produce.

    The greedy placement is order-dependent but still a deterministic
    sequential fold, so it IS oracle-checkable: TRAIN_BFD_SQL replays
    the exact fold in DuckDB with WITH RECURSIVE carrying per-shard bin
    loads as a LIST (round 12 — was rows-only). Correctness is further
    pinned by (a) a pure-python replication test over every shard and
    (b) in-plan accounting witnesses (no bin over budget, bin count at
    or above the fractional lower bound) asserted on every row.

    Scale (100 TB): packing parallelizes over shards (doc_id % N — at
    real scale thousands of shards, each an independent applyInPandas
    group whose state is its own docs only); the per-shard BFD loop is
    Arrow-batched Python over that shard's (doc_id, n_tok) pairs —
    16 bytes/doc, NOT the text (column pruning keeps payloads out of
    the shuffle). Oversize docs (n_tok > budget) are counted, not
    silently dropped."""
    import pandas as pd

    d = tables(spark, sf, "documents").documents
    toks = d.select(
        "doc_id",
        (F.col("doc_id") % _NSHARDS).alias("shard"),
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok"),
    )

    def _bfd(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        fit = pdf[pdf["n_tok"] <= _BFD_BUDGET].sort_values(
            ["n_tok", "doc_id"], ascending=[False, True]
        )
        oversize = int((pdf["n_tok"] > _BFD_BUDGET).sum())
        loads: list[int] = []
        for t in fit["n_tok"].tolist():
            # fullest bin that still fits (best-fit); bins scanned in
            # load order via a linear pass — bin counts per shard are
            # bounded by the shard's doc count
            best, best_load = -1, -1
            for i, ld in enumerate(loads):
                if ld + t <= _BFD_BUDGET and ld > best_load:
                    best, best_load = i, ld
            if best < 0:
                loads.append(t)
            else:
                loads[best] += t
        total = int(fit["n_tok"].sum())
        # next-fit over arrival (doc_id) order: the streaming baseline
        nf_bins, cur = 0, _BFD_BUDGET + 1
        for t in pdf[pdf["n_tok"] <= _BFD_BUDGET].sort_values("doc_id")[
            "n_tok"
        ].tolist():
            if cur + t > _BFD_BUDGET:
                nf_bins += 1
                cur = t
            else:
                cur += t
        lower = -(-total // _BFD_BUDGET) if total else 0
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_docs": [int(len(fit))],
                "n_oversize": [oversize],
                "total_tokens": [total],
                "bins_bfd": [len(loads)],
                "bins_nextfit": [nf_bins],
                "bins_lower_bound": [lower],
                "max_bin_tokens": [max(loads) if loads else 0],
                "waste_ppm": [
                    (len(loads) * _BFD_BUDGET - total)
                    * 1_000_000
                    // (len(loads) * _BFD_BUDGET)
                    if loads
                    else 0
                ],
            }
        )
    out_schema = (
        "shard int, n_docs long, n_oversize long, total_tokens long, "
        "bins_bfd long, bins_nextfit long, bins_lower_bound long, "
        "max_bin_tokens long, waste_ppm long"
    )
    packed = toks.groupBy("shard").applyInPandas(_bfd, out_schema)
    # in-plan witnesses: budget respected, bin count never below the
    # fractional lower bound. (bins_bfd <= bins_nextfit is NOT a
    # theorem — on 11/9-worst-case BFD instances whose arrival order
    # matches an optimal packing, next-fit can win — so it lives only
    # as a fixture-pinned check in tests/test_round10_ops.py.)
    return packed.select(
        "*",
        F.assert_true(
            (F.col("max_bin_tokens") <= _BFD_BUDGET)
            & (F.col("bins_bfd") >= F.col("bins_lower_bound")),
            F.lit("BFD packing invariant violated"),
        ).alias("_chk"),
    ).drop("_chk").orderBy("shard")


QUERIES: dict[str, QuerySpec] = {
    "train_pack_concat_chunks": QuerySpec(
        train_pack_concat_chunks, TRAIN_CONCAT_CHUNKS_SQL
    ),
    "train_contamination_bloom": QuerySpec(
        train_contamination_bloom, _bloom_oracle_sql()
    ),
    "train_curriculum_order": QuerySpec(
        train_curriculum_order, TRAIN_CURRICULUM_SQL
    ),
    "train_split_hash": QuerySpec(train_split_hash, TRAIN_SPLIT_SQL),
    "train_bpe_merges": QuerySpec(train_bpe_merges, TRAIN_BPE_SQL),
    "train_bpe_encode": QuerySpec(train_bpe_encode, TRAIN_BPE_ENCODE_SQL),
    "train_sample_weighted": QuerySpec(
        train_sample_weighted, _train_weighted_sql()
    ),
    "train_token_budget_sample": QuerySpec(
        train_token_budget_sample, TRAIN_BUDGET_SQL
    ),
    "train_sample_stratified": QuerySpec(
        train_sample_stratified, TRAIN_SAMPLE_SQL
    ),
    "train_seq_packing": QuerySpec(train_seq_packing, TRAIN_PACK_SQL),
    "train_contamination_ngram": QuerySpec(
        train_contamination_ngram, TRAIN_CONTAMINATION_SQL
    ),
    "train_mix_weights": QuerySpec(train_mix_weights, TRAIN_MIX_SQL),
    "train_split_leakage": QuerySpec(train_split_leakage, _train_leakage_sql()),
    "train_doc_chunking": QuerySpec(train_doc_chunking, TRAIN_CHUNK_SQL),
    "train_dsir_select": QuerySpec(train_dsir_select, TRAIN_DSIR_SQL),
    "train_priority_sample_sum": QuerySpec(
        train_priority_sample_sum, TRAIN_PRIORITY_SQL
    ),
    "train_epoch_shuffle_shards": QuerySpec(
        train_epoch_shuffle_shards, TRAIN_SHUFFLE_SQL
    ),
    "train_pack_bestfit": QuerySpec(train_pack_bestfit, TRAIN_BFD_SQL),
}
