"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE SHORT JSON line (sized to fit the driver's stdout tail
buffer — round-9's inline 4-draw payload overflowed it and the round
artifact lost its headline):
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: steady_median_sec, ...}, "sf": ...,
   "duckdb_total": sec, "bench_vs_duckdb": ratio,
   "draws_sec": [per-draw totals], "full_payload": path, "sha": ...}
The full payload (cold samples, per-query DuckDB times, per-draw
medians) goes to $SPARK_GRAFT_BENCH_OUT (default under /tmp, outside
the repo so writing it never dirties a later artifact's stamp).

Execution is forced with a noop sink (full pipeline, no driver collect
cost), mirroring the reference benchmark harness's timing shape
(reference: benchmarks/src/bin/tpch.rs benchmark loop).

Hygiene (round-1 verdict, tightened round 4): each query runs once cold
(``queries_cold``) then three timed iterations, and ``queries`` reports
the MEDIAN of the three — the second run alone still carries whole-stage
codegen compilation for the larger plans (measured: up to 2x), so a
single post-warmup sample was too noisy to compare round-over-round.
The iteration count is recorded in the JSON. The same
queries' oracle SQL also runs on DuckDB (same parquet, same thread count)
for a genuine same-scale local ratio — the reference's own published
baseline lacks a single-node number at these SFs (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

from datafusion_ballista_spark.stamp import git_sha as _git_sha


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from datafusion_ballista_spark.inventory import all_queries
    from datafusion_ballista_spark.session import get_session

    # SPARK_GRAFT_DRIVER_MEM sizes the single-JVM heap for one-off larger-
    # scale runs (e.g. the sf1 stress bench); unset = Spark default, so the
    # standard sf0.1 measurement is untouched.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    # SPARK_GRAFT_MAXPART (spark.sql.files.maxPartitionBytes) splits the
    # sf1 fixtures' single ~50 MB files into parallel scan tasks, matching
    # the gate tool's knob; unset for the standard sf0.1 run.
    maxpart = os.environ.get("SPARK_GRAFT_MAXPART")
    # SPARK_GRAFT_ADVISORY (spark.sql.adaptive.advisoryPartitionSizeInBytes)
    # sizes AQE-coalesced reducers for one-off larger-scale runs: the 64 MiB
    # default is right for network-shuffle clusters, but on one node it
    # collapses a 1.5M-group aggregate's output to a single core (local
    # shuffle reads are cheap; parallelism is the scarce resource).
    advisory = os.environ.get("SPARK_GRAFT_ADVISORY")
    spark = get_session(
        master=f"local[{cpus}]",
        app_name="dbspark-bench",
        shuffle_partitions=int(cpus),
        extra_conf={
            k: v
            for k, v in {
                "spark.driver.memory": mem,
                "spark.sql.files.maxPartitionBytes": maxpart,
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": advisory,
            }.items()
            if v
        }
        or None,
    )

    headline = [
        "tpch_q1",
        "tpch_q3",
        "tpch_q5",
        "tpch_q9_profit",
        "tpch_q13_custdist",
        "tpch_q18_large_volume",
        # LLM-pipeline path, perf-tracked round-over-round (round-2 verdict):
        "dedup_minhash_lsh",
        "ann_lsh_bucketed",
        "h2o_g2_sum_by_id1_id2",
        # round-4 additions: a wide TPC-DS join shape and the shingle-heavy
        # decontamination sweep (both new to the tracked set this round —
        # round-over-round comparisons start at r04 for these two)
        "tpcds_q64_shape",
        "train_contamination_ngram",
        # round-5 addition: verbatim TPC-DS over the real star fixture
        # (own committed scale point — ignores sf_dir; tracking starts r05)
        "tpcds_real_q98",
        # round-6 additions (tracking starts r06): the unigram-LM quality
        # scorer (token-explode + Zipf-skewed join) and the bucketed
        # interval join (the range-join scale rewrite)
        "quality_unigram_logprob",
        "ev_range_join_bucketed",
        # late round-6 additions (tracking starts r06): the Gopher
        # repetition filters (two doc_id-keyed shuffles + per-row bigram
        # codegen) and iterative exact-integer k-means (3 full passes
        # over the corpus: the multi-job pipeline shape)
        "quality_repetition_gopher",
        "emb_kmeans_lloyd",
        # latest round-6 addition (tracking starts r06): SemDeDup —
        # the cluster-then-within-cluster-self-join pipeline shape
        # (k-means passes + capped pair join + exact-decimal threshold)
        "dedup_semdedup",
        # final round-6 additions (tracking starts r06): exact substring
        # dedup (the LINEAR repeated-span pass: explode + countDistinct
        # groupBy + window union) and PQ encoding (4 codebook trainings +
        # the map-only encode pass)
        "dedup_substring_exact",
        "emb_pq_encode",
        # round-8 additions (tracking starts r08, VERDICT r7 Next #5):
        # the heaviest round-7 ops — corpus BPE tokenization (2 corpus
        # shuffles + 16-round word-type encode), content-defined
        # chunking (explode + per-doc cumsum window + 2 partial aggs),
        # and the IVF-PQ query path (coarse assignment + PQ encode +
        # nprobe-bounded ADC ranking). The 19 rows above are unchanged
        # and remain method-frozen-comparable to r06/r07.
        "train_bpe_encode",
        "dedup_cdc_chunks",
        "ann_ivfpq_topk",
        # round-9 additions (tracking starts r09, VERDICT r8 Next #5):
        # the two heaviest round-8 ops — winnowing fingerprints (the
        # materialize-once fingerprint table + fingerprint-bucketed
        # pair join) and the prefix-filtered exact Jaccard join (whose
        # 41M->1.5M candidate-cut claim deserves round-over-round
        # scrutiny). The 22 rows above stay method-frozen-comparable.
        "text_winnow_fingerprint",
        "dedup_prefix_filter_join",
        # round-10 additions (tracking starts r10): the two heaviest
        # round-10 ops — the theta/KMV set-operation sketch (shingle
        # explode + distinct + two bounded top-k + the exact witness
        # pass) and the KLL quantile sketch (per-partition Python
        # compactor streams + bounded merge + the conditional-agg
        # witness pass). The 24 rows above stay method-frozen.
        "sketch_theta_set_ops",
        "sketch_kll_quantiles",
        # late-round-10 additions (tracking starts r10): the two
        # heaviest of the 13 late-round ops (all sub-second at sf0.1)
        # — multi-probe LSH (9x probe fan-out over one index) and the
        # blocked+digest-short-circuited edit-distance verify tier.
        # The 26 rows above stay method-frozen.
        "ann_lsh_multiprobe",
        "dedup_edit_distance_verify",
    ]
    specs = all_queries()
    names = [n for n in headline if n in specs]

    # warmup: JVM/codegen/parquet footer caches on the smallest query
    specs["tpch_q6"].spark(spark, sf_dir).write.format("noop").mode("overwrite").save()

    iterations = 3
    # SPARK_GRAFT_BENCH_DRAWS > 1 repeats the whole steady loop and
    # records every draw's total in the JSON (round-8 VERDICT Next #7a:
    # the machine's documented ±25% cross-invocation noise band belongs
    # in the artifact as a machine-readable "draws" field, not in README
    # prose). Draw 1 keeps the frozen method (cold + 3-iteration medians)
    # and feeds "queries"/"value", so round-over-round comparability is
    # untouched; later draws are warm re-measurements of the same method.
    n_draws = int(os.environ.get("SPARK_GRAFT_BENCH_DRAWS", "1"))
    cold: dict[str, float] = {}
    draws: list[dict] = []
    for d in range(n_draws):
        per_draw: dict[str, float] = {}
        for name in names:
            samples: list[float] = []
            for it in range(1 + iterations if d == 0 else iterations):
                t0 = time.perf_counter()
                df = specs[name].spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                if d == 0 and it == 0:
                    cold[name] = dt
                else:
                    samples.append(dt)
            per_draw[name] = sorted(samples)[len(samples) // 2]
        draws.append(
            {
                "value": round(sum(per_draw.values()), 3),
                "queries": per_draw,
            }
        )
    steady = draws[0]["queries"]

    # Same queries on DuckDB over the same parquet, same parallelism.
    duck: dict[str, float] = {}
    try:
        import duckdb

        con = duckdb.connect()
        con.execute(f"SET threads = {int(cpus)}")
        # Oracle memory guard (round-8 VERDICT Next #3): a runaway
        # oracle plan must fail fast, not evict the VM's page cache
        # (the r8 93 GB hash-build incident poisoned bench draws for
        # hours afterwards).
        con.execute(
            "SET memory_limit = "
            f"'{os.environ.get('SPARK_GRAFT_ORACLE_MEM', '16GB')}'"
        )
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split():
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        for name in names:
            sql = specs[name].oracle
            if not sql:
                continue
            con.execute(sql).fetchall()  # warm
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            duck[name] = round(time.perf_counter() - t0, 3)
        con.close()
    except Exception:
        duck = {}

    total = round(sum(steady.values()), 3)
    duck_total = round(sum(duck.values()), 3) if duck else None
    # Watched per-query same-scale ratios (round-12 VERDICT Next #7):
    # the two ops whose rewrites carry explicit sf1 ratio claims get
    # their spark/duckdb ratio surfaced in the one-line summary so a
    # regression is visible without opening the full payload.
    watched = {
        n: round(steady[n] / duck[n], 2)
        for n in ("dedup_prefix_filter_join", "ev_range_join_bucketed")
        if n in steady and duck.get(n)
    }
    # Stamp BEFORE writing the full-payload file, so writing it cannot
    # self-dirty the stamp.
    sha = _git_sha()
    full = {
        "metric": "headline_total_steady",
        "value": total,
        "unit": "sec",
        "queries": steady,
        "sf": _sf_of(sf_dir),
        "iterations": iterations,
        "queries_cold": cold,
        "duckdb": duck,
        "bench_vs_duckdb": (
            round(total / duck_total, 3) if duck_total else None
        ),
        "watched_ratios": watched,
        "sha": sha,
    }
    if n_draws > 1:
        full["draws"] = draws
    # Round-9 VERDICT Next #3: the single JSON line (with 4 inline
    # draws) outgrew the driver's stdout tail buffer, so BENCH_r09's
    # `parsed` came back null. The LAST stdout line is now a SHORT
    # self-sufficient summary (headline value, per-query steady
    # medians, ratio, draw spread, sha); the full payload — cold
    # samples, DuckDB per-query times, per-draw medians — goes to a
    # file OUTSIDE the repo (default /tmp, override
    # SPARK_GRAFT_BENCH_OUT) so writing it never dirties a later
    # artifact's stamp.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT", "/tmp/spark_graft_bench_full.json"
    )
    try:
        with open(out_path, "w") as f:
            json.dump(full, f)
    except OSError:
        out_path = None
    summary = {
        "metric": "headline_total_steady",
        "value": total,
        "unit": "sec",
        "queries": steady,
        "sf": _sf_of(sf_dir),
        "iterations": iterations,
        "duckdb_total": duck_total,
        "bench_vs_duckdb": (
            round(total / duck_total, 3) if duck_total else None
        ),
        "draws_sec": [d["value"] for d in draws],
        "watched_ratios": watched,
        "full_payload": out_path,
        "sha": sha,
    }
    print(json.dumps(summary))
    spark.stop()


def _sf_of(sf_dir: str):
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return float(sf) if sf.replace(".", "").isdigit() else sf


if __name__ == "__main__":
    sys.exit(main())
