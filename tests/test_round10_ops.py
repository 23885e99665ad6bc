"""Property tests for the late-round-10 operator batches (beyond the
hash-vs-oracle gate in test_inventory.py): each test pins the paper
invariant or cross-implementation consistency the oracle can't see.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from datafusion_ballista_spark.inventory import all_queries
from tests.conftest import SF_DIR

_ALL = all_queries()


def _run(spark, name):
    return _ALL[name].spark(spark, SF_DIR)


# ---------------------------------------------------------------- sketches


def test_ams_f2_within_bound_and_nonnegative(spark):
    rows = _run(spark, "sketch_ams_f2").collect()
    assert len(rows) == 5
    exact = rows[0].exact_f2
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    # F2 = sum f^2 >= sum f = N (every frequency >= 1)
    assert exact >= n_events
    for r in rows:
        assert r.est_f2 >= 0  # sum of squares
        assert r.exact_f2 == exact
        # 5-sigma AMS bound, asserted (fixture is fixed, so this is a
        # regression pin, not a flaky statistical test)
        assert abs(r.err_ppm) <= r.bound_ppm


def test_moments_match_numpy_ground_truth(spark):
    """The 1-row Spark aggregate must reproduce numpy's population
    moments computed directly on the raw column (a third, independent
    implementation next to the DuckDB oracle)."""
    row = _run(spark, "sketch_moments_power_sums").collect()[0]
    x = (
        duckdb.sql(
            f"SELECT l_extendedprice FROM '{SF_DIR}/lineitem.parquet'"
        )
        .df()["l_extendedprice"]
        .to_numpy()
    )
    c = np.round(x * 100).astype(np.int64)  # the same cents lift
    mu = c.mean()
    m2 = ((c - mu) ** 2).mean()
    m3 = ((c - mu) ** 3).mean()
    m4 = ((c - mu) ** 4).mean()
    assert row.n == len(c)
    assert row.mean == pytest.approx(mu / 100, abs=1e-3)
    assert row.stddev == pytest.approx(math.sqrt(m2) / 100, abs=1e-3)
    assert row.skewness == pytest.approx(m3 / m2**1.5, abs=1e-5)
    assert row.kurtosis_excess == pytest.approx(m4 / m2**2 - 3, abs=1e-5)


def test_hll_sliding_window_dominates_hourly(spark, oracle):
    """A trailing-3h window's EXACT distinct count can never be below
    the same hour's 1h distinct count (superset), and the estimate must
    stay inside 5 sigma of the m=64 HLL stderr for every window."""
    rows = _run(spark, "sketch_hll_sliding_3h").collect()
    hourly = {
        int(hb): int(u)
        for hb, u in oracle.sql(
            "SELECT epoch_us(ts) // 3600000000 AS hb,"
            " COUNT(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    }
    assert len(rows) == len(hourly)
    bound = 5 * (1.04 / math.sqrt(64)) * 1e6  # 650000 ppm
    for r in rows:
        assert r.exact >= hourly[r.win_hour]
        assert r.n_buckets <= r.m
        assert abs(r.err_ppm) <= bound


# ------------------------------------------------------------------ train


def test_priority_sample_estimator_within_sampling_noise(spark):
    row = _run(spark, "train_priority_sample_sum").collect()[0]
    assert row.k == 64
    # DLT priority sampling stderr ~ 1/sqrt(k) ~ 12.5%; 4x margin
    assert abs(row.err_ppm) <= 500_000
    assert row.est_total > 0


def test_priority_sample_matches_pure_python_model(spark):
    """Re-derive the whole estimator in pure Python (hashlib md5, exact
    ints) from the raw parquet and require the identical estimate."""
    import hashlib

    docs = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    prios = []
    for doc_id, w in docs:
        h = (
            int(
                hashlib.md5(f"{doc_id}#ps".encode()).hexdigest()[:8], 16
            )
            + 1
        )
        prios.append((w * (1 << 32)) // h)
    order = sorted(
        zip(prios, [d for d, _ in docs], [w for _, w in docs]),
        key=lambda t: (-t[0], t[1]),
    )
    top = order[:65]
    tau = min(q for q, _, _ in top)
    kept = [(q, w) for q, _, w in top if q > tau]
    est = round(sum(max(float(w), float(tau)) for q, w in kept), 4)
    row = _run(spark, "train_priority_sample_sum").collect()[0]
    assert row.k == len(kept)
    assert row.est_total == est


def test_epoch_shuffle_balanced_and_epoch_distinct(spark):
    rows = _run(spark, "train_epoch_shuffle_shards").collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert sorted(by_epoch) == [0, 1, 2]
    fingerprints = set()
    for epoch, shards in by_epoch.items():
        assert sorted(s.shard for s in shards) == list(range(8))
        assert sum(s.n_docs for s in shards) == n_docs
        # every doc_id appears exactly once per epoch
        assert sum(s.sum_doc_id for s in shards) == n_docs * (n_docs - 1) // 2
        for s in shards:
            assert abs(s.dev_ppm) < 100_000  # < 10% imbalance
        # the per-epoch shard-count vector must differ across epochs
        # (a reshuffle that isn't reshuffling would repeat it)
        fingerprints.add(tuple(s.sum_doc_id for s in shards))
    assert len(fingerprints) == 3


# ----------------------------------------------------------------- events


def test_decayed_topk_invariants(spark):
    rows = _run(spark, "ev_decayed_topk").collect()
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r.n for r in rows) == n_events
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        # halving weekly decays slower than halving daily: age//7 <= age
        assert r.score_hl7d >= r.score_hl1d
        # every weight <= 1 after normalization
        assert r.score_hl1d <= r.n


# ----------------------------------------------------------------- vector


def test_matryoshka_full_dim_recall_is_perfect(spark, monkeypatch):
    """Sanity anchor for the truncation arm: with d_trunc == the full
    64 dims the two ranking arms are identical, so recall@5 must be
    exactly 100% for every query."""
    import datafusion_ballista_spark.inventory.pipeline_vector as pv

    monkeypatch.setattr(pv, "_MRL_DIM", 64)
    rows = pv.emb_matryoshka_trunc(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_overlap == r.k
        assert r.recall_ppm == 1_000_000


def test_multiprobe_dominates_single_bucket(spark):
    """9-probe candidates are a superset of the home bucket's, so at
    every (qid, rank) the multiprobe cosine must be >= the
    single-bucket cosine, and some hit must come from a flipped
    bucket (otherwise multiprobing did nothing on this fixture)."""
    mp = {
        (r.qid, r.rk): (r.cosine, r.probe_dist)
        for r in _run(spark, "ann_lsh_multiprobe").collect()
    }
    sb = {
        (r.qid, r.rk): r.cosine
        for r in _run(spark, "ann_lsh_bucketed").collect()
    }
    assert mp and sb
    for key, cos in sb.items():
        assert key in mp and mp[key][0] >= cos
    assert any(pd == 1 for _, pd in mp.values())
    assert all(pd in (0, 1) for _, pd in mp.values())


# ------------------------------------------------------------------- text


def test_edit_distance_pairs_verified_in_python(spark):
    """Every reported pair re-verified with a reference Levenshtein
    implementation in Python; every pair must share the 32-char block."""
    rows = _run(spark, "dedup_edit_distance_verify").collect()
    assert rows, "fixture is known to contain near-duplicate pairs"
    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, lower(trim(text)) FROM "
            f"'{SF_DIR}/documents.parquet'"
        ).fetchall()
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    for r in rows:
        a, b = texts[r.doc_a], texts[r.doc_b]
        assert a[:32] == b[:32]
        d = lev(a, b)
        expect = d if d <= 128 else -1
        assert r.lev == expect
        if r.lev >= 0:
            m = max(len(a), len(b))
            assert r.sim_ppm == (m - r.lev) * 1_000_000 // m


def test_zipf_fit_matches_numpy_regression(spark):
    row = _run(spark, "text_zipf_fit").collect()[0]
    counts = duckdb.sql(
        f"""
        SELECT tok, COUNT(*) AS f
        FROM (SELECT unnest(string_split(lower(trim(text)), ' ')) AS tok
              FROM '{SF_DIR}/documents.parquet')
        WHERE tok <> '' GROUP BY tok ORDER BY f DESC, tok LIMIT 100
        """
    ).fetchall()
    y = np.log([f for _, f in counts])
    x = np.log(np.arange(1, len(counts) + 1))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert row.zipf_slope == pytest.approx(slope, abs=1e-5)
    assert row.zipf_r2 == pytest.approx(r * r, abs=1e-5)
    assert row.n_types >= len(counts)


def test_bestfit_packing_matches_python_replication(spark):
    """Full pure-python replication of the per-shard BFD + next-fit
    accounting from the raw parquet; every output cell must match."""
    from datafusion_ballista_spark.inventory.pipeline_train import (
        _BFD_BUDGET,
        _NSHARDS,
    )

    rows = {r.shard: r for r in _run(spark, "train_pack_bestfit").collect()}
    docs = duckdb.sql(
        f"SELECT doc_id, len(string_split(trim(text), ' ')) FROM "
        f"'{SF_DIR}/documents.parquet'"
    ).fetchall()
    assert sorted(rows) == list(range(_NSHARDS))
    for shard in range(_NSHARDS):
        mine = [(d, t) for d, t in docs if d % _NSHARDS == shard]
        fit = sorted(
            [(d, t) for d, t in mine if t <= _BFD_BUDGET],
            key=lambda p: (-p[1], p[0]),
        )
        loads: list[int] = []
        for _, t in fit:
            best, best_load = -1, -1
            for i, ld in enumerate(loads):
                if ld + t <= _BFD_BUDGET and ld > best_load:
                    best, best_load = i, ld
            if best < 0:
                loads.append(t)
            else:
                loads[best] += t
        nf, cur = 0, _BFD_BUDGET + 1
        for _, t in sorted((p for p in mine if p[1] <= _BFD_BUDGET)):
            if cur + t > _BFD_BUDGET:
                nf, cur = nf + 1, t
            else:
                cur += t
        total = sum(t for _, t in fit)
        r = rows[shard]
        assert r.n_docs == len(fit)
        assert r.n_oversize == sum(1 for _, t in mine if t > _BFD_BUDGET)
        assert r.total_tokens == total
        assert r.bins_bfd == len(loads)
        assert r.bins_nextfit == nf
        assert r.bins_lower_bound == -(-total // _BFD_BUDGET)
        assert r.max_bin_tokens == (max(loads) if loads else 0)
        assert r.bins_lower_bound <= r.bins_bfd <= r.bins_nextfit


def test_anomaly_mad_exhaustive_python_replication(spark):
    """Recompute the full Hampel flag set in python: the op must emit
    EXACTLY the anomalous (type, hour) rows — none missed, none extra."""
    got = {
        (r.event_type, r.hour): r
        for r in _run(spark, "ev_anomaly_mad").collect()
    }
    counts = duckdb.sql(
        f"SELECT event_type, epoch_us(ts) // 3600000000, COUNT(*) FROM "
        f"'{SF_DIR}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    by_type: dict[str, list] = {}
    for et, hb, n in counts:
        by_type.setdefault(et, []).append((hb, n))
    expected = set()
    for et, pairs in by_type.items():
        med = float(np.median([n for _, n in pairs]))
        mad = float(np.median([abs(n - med) for _, n in pairs]))
        for hb, n in pairs:
            if abs(n - med) > 3.0 * mad:
                expected.add((et, hb))
    assert set(got) == expected
    for (et, hb), r in got.items():
        assert r.score > 3.0


def test_vocab_coverage_monotone_and_anchored_to_zipf(spark):
    rows = _run(spark, "text_vocab_coverage").collect()
    assert rows and rows[0].v == 1
    zipf = _run(spark, "text_zipf_fit").collect()[0]
    assert rows[0].coverage_ppm == zipf.top1_share_ppm
    cov = [r.coverage_ppm for r in rows]
    assert cov == sorted(cov)  # more types can only cover more
    for r in rows:
        assert r.head_tokens <= r.n_tokens
        assert r.v <= r.n_types


def test_recall_eval_multiprobe_dominates_and_anchors(spark):
    """Structural invariant: multiprobe candidates are a superset of
    single-bucket candidates, so hits_multi >= hits_single per query;
    recall ppm must be exactly hits/k; and the multiprobe arm must
    agree with ann_lsh_multiprobe's own top-k overlap vs brute force."""
    rows = _run(spark, "ann_recall_eval").collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r.hits_single <= r.hits_multi <= r.k
        assert r.recall_single_ppm == r.hits_single * 1_000_000 // r.k
        assert r.recall_multi_ppm == r.hits_multi * 1_000_000 // r.k
    # cross-check one arm against the standalone ops' outputs
    exact = {
        (r.qid, r.nid)
        for r in _run(spark, "ann_bruteforce_topk").collect()
        if r.rk <= 3 and r.qid < 20
    }
    mp = {
        (r.qid, r.nid)
        for r in _run(spark, "ann_lsh_multiprobe").collect()
    }
    # qids 0..4 are shared between ann_bruteforce (Q=5) and the eval
    for r in rows:
        if r.qid < 5:
            want = len(
                {(q, n) for q, n in exact if q == r.qid}
                & {(q, n) for q, n in mp if q == r.qid}
            )
            assert r.hits_multi == want


def test_stream_sliding_counts_fanout_conservation(spark):
    """Every event serves exactly 3 sliding windows, so the n-sum over
    all (window, type) rows must be exactly 3x the event count."""
    rows = _run(spark, "stream_sliding_counts").collect()
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r.n for r in rows) == 3 * n_events
    starts = sorted({r.win_start for r in rows})
    assert len(starts) >= 3
