#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line (compact separators;
diagnostics first, "value" and "queries" LAST so the driver's 2,000-char
tail capture always keeps the per-query timings — see build_result):

    {"metric": "...", "unit": "sec", "sf": 0.1, ...diagnostics...,
     "value": <total sec>, "queries": {name: sec, ...}}

The full dict is also written to BENCH_DETAIL.json next to this file
(override: $SPARK_GRAFT_BENCH_DETAIL) so the committed tree keeps the
bracket diagnostics the driver tail truncates away.

Each query is forced to full materialization with a noop write (no driver
collect, no display cost). The set spans every engine subsystem: Pregel
iteration (pagerank/sssp/cc), joins+agg (q1/q3/q5), windows, sort, dedup
LSH, similarity, k-means, streaming's batch twin.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# interleave a ~0.2 s calibration probe every N queries (round-9 verdict
# item 3: three rounds of forensics re-adjudicated mid-run host throttling
# that the single pre/post probe pair could not localize — per-query
# brackets let the artifact flag its own noisy rows). ~10 probes on the
# full 74-query set ≈ 2 s against a ~200 s run.
CAL_EVERY = int(os.environ.get("SPARK_GRAFT_BENCH_CAL_EVERY", "8"))
# a query whose surrounding probes disagree by >1.25x ran on a host whose
# speed CHANGED during its segment — its timing is an upper bound, not a
# measurement (the r6/r7/r9 adjudication threshold)
NOISY_DRIFT = 1.25


def compute_brackets(seg_index: dict[str, int], probes: list[float],
                     threshold: float = NOISY_DRIFT):
    """(brackets, noisy): per-query calibration bracket pairs and the names
    whose bracket drifted past ``threshold``. ``seg_index[name]`` is the
    index of the probe taken BEFORE name's segment; the probe at index+1
    closes the segment (the post-run probe closes the last one). Pure so
    tests can pin the schema and the flagging rule without a Spark run."""
    brackets = {
        name: [probes[j], probes[j + 1]] for name, j in seg_index.items()
    }
    noisy = sorted(
        name for name, (a, b) in brackets.items()
        if min(a, b) > 0 and max(a, b) / min(a, b) > threshold
    )
    return brackets, noisy


def build_result(timings: dict[str, float], sf: float | None,
                 calibration: float, calibration_post: float,
                 brackets: dict[str, list[float]],
                 noisy: list[str], retry_floor: float = 2.0) -> dict:
    """Assemble the artifact dict in the TAIL-SAFE key order.

    The driver records only the LAST 2,000 characters of the bench stdout —
    round 10 appended ``calibration_brackets``/``noisy`` AFTER ``queries``
    and evicted every per-query timing from BENCH_r10.json (round-10
    verdict item 1). Contract, pinned by tests/test_rotation.py: the
    diagnostic bulk (brackets, per-row drift ratios, noisy list) comes
    FIRST and ``value`` + ``queries`` are the LAST keys, so a 2,000-char
    tail of the compact-separator dump always contains the full parseable
    timings dict. ``bracket_drift`` carries each row's max/min probe ratio
    so artifact consumers can apply their own noise threshold instead of
    the binary ``noisy`` flag (round-10 verdict item 6);
    ``calibration_estimator`` records that probes are min-of-2 since r10 —
    earlier artifacts' single-sample drift ratios are a different statistic
    (round-10 ADVICE)."""
    drift = {
        name: round(max(a, b) / min(a, b), 3)
        for name, (a, b) in sorted(brackets.items()) if min(a, b) > 0
    }
    return {
        "metric": "gmr_spark_headline_total",
        "unit": "sec",
        "sf": sf,
        # headline set GREW round-over-round (r1: 33, r2: 34, r3: 47) —
        # compare totals only per-query or normalized by n_queries
        "n_queries": len(timings),
        "calibration_sec": calibration,
        "calibration_post_sec": calibration_post,
        "calibration_estimator": "min2",
        # rows above the floor are min-of-2 since r11 (floor was 15 s in
        # r3-r10 — pre-r11 per-row values are single-sample below 15 s)
        "row_estimator": "min2_above_floor",
        "retry_floor_sec": retry_floor,
        # per-query host-speed brackets: [probe before the query's segment,
        # probe after]. A stable host reads ~[0.2, 0.2] everywhere; a row
        # whose bracket disagrees >1.25x is listed in "noisy" — its timing
        # is an upper bound, not a measurement (self-adjudication instead
        # of next-round forensics; round-9 verdict item 3)
        "calibration_brackets": brackets,
        "bracket_drift": drift,
        "noisy": noisy,
        "value": round(sum(timings.values()), 3),
        "queries": timings,
    }


def detail_sidecar_name(cpus: str | int) -> str:
    """Sidecar filename keyed by core count (r14 VERDICT item 6: the
    driver's 8-core scaling run used to OVERWRITE the committed 32-core
    full-run BENCH_DETAIL.json). The canonical full bench (the driver's
    primary 32-core run) keeps the unsuffixed name; any other core count
    writes its own ``BENCH_DETAIL_c<N>.json``."""
    return ("BENCH_DETAIL.json" if str(cpus) == "32"
            else f"BENCH_DETAIL_c{cpus}.json")


def contract_line(result: dict) -> str:
    """Serialize the minimal driver-contract line for stdout.

    The driver keeps only the last 2,000 stdout characters and json-parses
    them; the full artifact (with calibration brackets) is ~12 KB, so it
    lives in the sidecar/stderr and the stdout line carries exactly the
    contract keys — metric, unit, sf, value, queries (~1.9 KB at 79 rows,
    2 dp) — in tail-safe order (value+queries last) so a truncated tail
    still ends with the complete timings dict."""
    import json as _json
    return _json.dumps(
        {
            "metric": result["metric"],
            "unit": result["unit"],
            "sf": result["sf"],
            "value": result["value"],
            "queries": result["queries"],
        },
        separators=(",", ":"),
    )


HEADLINE = [
    # all derived graphs the bench's graph queries share, materialized once
    # and billed HERE (round-5: derivation is memoized per session —
    # sources/derive._GRAPH_MEMO — so algorithm rows measure the algorithm,
    # matching the reference's parse-excluded timings)
    "derive_graphs",
    "pagerank_geo",
    "pagerank_big",
    "pagerank_hub",
    "bfs_geo",
    "sssp_cs",
    "cc_cs",
    "triangles_ring",
    "scc_nation_ring",
    "degrees_cs",
    "kmeans_embeddings",
    "mst_nation_mesh",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q18_large_orders",
    "semi_join_priority",
    "range_join_events",
    "zscore_events",
    "rollup_revenue",
    "window_running",
    "sessionize",
    "asof_join_orders",
    "global_sort_rank",
    "approx_sketch_stats",
    "dedup_exact",
    # the memoized shingle→signature→band-join→verify chain is billed to its
    # own row (round-4 verdict item 9): dedup_minhash / dup_clusters /
    # dedup_containment then measure their INCREMENTAL cost over the shared
    # chain instead of whichever ran first silently paying for the rest.
    # The chain's blocks are released right after the run's last chain
    # consumer (post_query hook) so they don't tax the remaining queries.
    "dedup_pair_chain",
    "dedup_minhash",
    "dup_clusters",
    "dedup_containment",
    "dedup_simhash",
    "dedup_embedding",
    # round 12 addition: the composed curation pipeline (declared since
    # round 13; rides the memoized dedup chain, so this row measures the
    # INCREMENTAL cost of composing — quality filters + packing + joins)
    "curation",
    "multimodal_features",
    "cosine_topk",
    "ann_sign_lsh",
    "doc_fingerprints",
    "token_stats",
    "events_hourly",
    # round 3 additions: sampling, chunking,
    # redaction, sliding windows, and the heaviest of the new TPC-H shapes
    "stratified_sample",
    "doc_chunking",
    "pii_scrub",
    "events_sliding",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "gopher_quality",
    "contamination_check",
    "sequence_packing",
    "kmv_distinct_sketch",
    "ppr_geo",
    # round 4 additions: the JVM-window z-score twin (headline variant of
    # the applyInPandas declared surface) and random-hyperplane LSH
    "zscore_events_window",
    "ann_rh_lsh",
    # round 4 additions: warehouse MERGE/upsert, stream-stream join batch
    # twin, k-core peeling, per-vertex clustering coefficient
    "merge_upsert_orders",
    "stream_attribution_join",
    "kcore_cs",
    "clustering_coeff_hub",
    "scd2_order_history",
    "events_session_windows",
    "dq_audit",
    "shortest_paths_geo",
    # round 5 additions: SVD++ batch GD and the dedup attribution row above
    "svdpp_ratings",
    "ktruss_hub_tri",
    "assortativity_cs",
    "graph_summary_cs",
    "degree_histogram_hub",
    # round 6 additions: BM25 retrieval scoring, SemDeDup semantic dedup,
    # exact-substring dedup (Lee et al. ExactSubstr)
    "bm25_topk",
    "semdedup_embeddings",
    "dedup_substring",
    "multimodal_audio",
    "unigram_lm_score",
    "dsir_select",
    # round 8 addition: the pack hop, attribution-split like the dedup
    # chain — the one-time landing-zone + pack build is billed to its own
    # row (the cost a corpus pays ONCE, SCALE.md round 8), so the
    # multimodal_pack row measures what every later pass pays: the packed
    # re-scan + decode
    "multimodal_pack_build",
    "multimodal_pack",
    # round 9 addition: IVF-PQ — the compressed-index (4 B/vector) ANN path
    "ann_ivf_pq",
    # round 10 addition: the trained-codebook (per-subspace Lloyd) IVF-PQ —
    # the production path; its incremental cost over ann_ivf_pq is the
    # training passes (bench-only query, see queries.BENCH_ONLY_QUERIES)
    "ann_ivf_pq_trained",
    # round 11 addition: the FULL production config — trained codebook AND
    # Lloyd-trained coarse cells; incremental cost over _trained is the
    # cell-training Lloyd passes on the 1-in-10 sample
    "ann_ivf_pq_celltrained",
    # round 10 addition: the Arrow/GEMM exact top-k scale path (declared,
    # shares cosine_topk's oracle)
    "cosine_topk_arrow",
    # round 12 addition: recall@3 of the production config above vs the
    # exact GEMM truth — the bench-timed config is now also
    # recall-regression-guarded per round (bench-only; tests pin
    # recall >= the seeded ann_ivf_pq's)
    "ann_recall_production",
]


def main() -> None:
    from gmr_spark.operators.dedup import _verified_jaccard_pairs, clear_dedup_memo
    from gmr_spark.queries import BENCH_ONLY_QUERIES, all_queries
    from gmr_spark.session import get_session

    spark = get_session("gmr_spark_bench", cpus=CPUS)

    # WindowExec's "No Partition Defined" warning fires for the two
    # O(#partitions)-row offset tables (relational.global_sort_rank,
    # sources.derive) — verified harmless by the plan pins at
    # tests/test_plans.py (only the tiny side is single-partition), so
    # silence the logger instead of letting the noise read as a perf bug.
    try:
        jvm = spark.sparkContext._jvm
        for logger in (
            "org.apache.spark.sql.execution.window.WindowExec",
            # unpersisting superseded localCheckpoints is deliberate
            # (_drop_checkpoint_blocks / clear_dedup_memo): the dropped RDDs
            # are by construction never read again
            "org.apache.spark.rdd.MapPartitionsRDD",
        ):
            jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                logger, jvm.org.apache.logging.log4j.Level.ERROR)
    except Exception:
        pass  # cosmetic only

    queries = {**all_queries(), **BENCH_ONLY_QUERIES}
    # synthetic attribution row: materialize the shared dedup verify chain
    # once, on its own clock (see the HEADLINE comment)
    queries["dedup_pair_chain"] = (
        lambda s, sf: _verified_jaccard_pairs(s, sf).select("doc_a", "doc_b"))

    # synthetic attribution row: the pack hop's one-time build (see the
    # HEADLINE comment). Returns the shard listing so the row has a frame.
    def _pack_build(s, sf):
        from gmr_spark.operators.multimodal import (
            _ensure_packed_payloads, _make_wav_payload_batches)

        packed = _ensure_packed_payloads(s, sf, "wav",
                                         _make_wav_payload_batches)
        return s.read.parquet(packed).select("doc_id")

    queries["multimodal_pack_build"] = _pack_build

    # synthetic attribution row for the memoized graph derivations (the
    # counts run on just-checkpointed blocks — metadata-cheap)
    DERIVED = ("geo", "cs", "ring", "hub", "hub_tri", "linked_lineitems")

    def _derive_all(s, sf):
        # independent derivations, materialized CONCURRENTLY: each Spark
        # job underutilizes the 32 cores in its narrow stages, so 3 driver
        # threads overlap them (distinct memo keys per graph name — no
        # contention; Spark actions are thread-safe)
        from concurrent.futures import ThreadPoolExecutor

        from gmr_spark.sources.derive import derive_graph, register_views

        # warm the registration memo once; the per-thread register_views
        # calls inside derive_graph are idempotent no-ops under its lock
        # (round-5 ADVICE: the catalog writes used to race)
        register_views(s, sf)

        def _one(n: str) -> tuple[str, int]:
            # the |E| census rides the derivation's own checkpoint job
            # (PropertyGraph.n_edges, r14); count() only as a fallback for
            # trees without the fused census
            g = derive_graph(s, sf, n, materialize=True)
            n_e = g.n_edges if g.n_edges is not None else g.edges.count()
            return (n, n_e)

        with ThreadPoolExecutor(max_workers=3) as ex:
            rows = sorted(ex.map(_one, DERIVED))
        return s.createDataFrame(rows, "graph string, n_edges long")

    queries["derive_graphs"] = _derive_all

    # warm the JVM/codegen path once on a cheap query
    queries["filter_scan"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # calibration: fixed synthetic workload (gmr_spark.session.calibration_probe,
    # ~0.16-0.25 s on an unloaded 32-core host). A high value flags an externally-throttled run (observed 3x
    # wall-clock swings on shared hosts) — interpret the query timings
    # relative to it. Measured BEFORE and AFTER the query loop: round 2's
    # headline was poisoned by mid-run throttling that a single pre-run
    # probe could not see (pagerank_big recorded 208 s, re-measured 31 s).
    from gmr_spark.session import calibration_probe

    def _calibrate() -> float:
        # min-of-2: a single ~0.2 s probe sample swings up to 2x on this
        # host (GC pause / scheduler jitter landing inside the probe), which
        # false-flags stable segments as noisy; min of two back-to-back
        # samples is the standard steady-state estimator (same rationale as
        # the RETRY_FLOOR min-of-2 below) and still costs <0.5 s per point
        return min(calibration_probe(spark), calibration_probe(spark))

    _calibrate()  # warm the calibration path itself (codegen + JIT), else the
    # pre-run probe reads ~3x slower than the post-run one and the drift
    # check misreads warmup as mid-run throttling
    calibration = _calibrate()

    import gc

    def _cleanup() -> None:
        # drop checkpoint/broadcast blocks from the finished query NOW —
        # ContextCleaner is async and the backlog of dead blocks otherwise
        # slows later queries by 3-5x
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    def _run_once(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        # 2 dp since r13: at 79 rows the 2,000-char driver tail had 32
        # chars of slack at 3 dp — one char per row buys room for the r14
        # promotion rows without touching the tail contract (the remedy
        # the r12 verdict item 5 prescribed). Sub-RETRY_FLOOR rows were
        # never row-level-claim material; brackets carry the diagnostics.
        dt = round(time.perf_counter() - t0, 2)
        _cleanup()
        return dt

    # Queries >RETRY_FLOOR s are measured twice and the MIN is recorded: a
    # single sample of a 30 s Pregel run swings 20-64 s on this host (GC
    # pause / disk contention landing mid-run — measured round 3;
    # fresh-session repeats are stable at 31-35 s), and one bad sample
    # poisoned the round-2 headline artifact. min-of-2 is the standard
    # steady-state estimator; sub-floor queries stay single-sample.
    # Round 11 lowered the floor 15 -> 2 s: all three r11 full-bench
    # attempts failed the bracket gate on sub-15 s row jitter, and one
    # extra sample on the ~25 affected rows costs ~90 s against a ~180 s
    # run. The estimator is recorded in the artifact
    # ("row_estimator"/"retry_floor_sec") because cross-round per-row
    # comparisons against pre-r11 single-sample artifacts are a different
    # statistic (the r10 ADVICE lesson on the calibration estimator).
    RETRY_FLOOR = float(os.environ.get("SPARK_GRAFT_BENCH_RETRY_FLOOR", "2.0"))
    # local-iteration escape hatch: SPARK_GRAFT_BENCH_ONLY="q1_...,dedup_..."
    # restricts the loop (the driver never sets it — full set is the contract)
    only = {s.strip() for s in
            os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if s.strip()}
    headline = [n for n in HEADLINE if not only or n in only]

    # release the chain's pinned checkpoint blocks right after its LAST
    # consumer PRESENT IN THIS RUN — without this every later query pays the
    # resident-blocks memory pressure (the r3→r4 +7.4% common-set drift,
    # VERDICT r4 item 1). Keyed on the run's actual headline so a
    # BENCH_ONLY subset can't strand the memo.
    # dedup_embedding joined the set in round 6: its normalized+bucketed
    # vector table is memoized in the same _CKPT_MEMO (released by the same
    # hook after the run's last dedup consumer)
    chain_consumers = {"dedup_pair_chain", "dedup_minhash", "dup_clusters",
                       "dedup_containment", "dedup_embedding", "curation"}
    post_query: dict[str, object] = {}
    present = [n for n in headline if n in chain_consumers]
    if present:
        post_query[present[-1]] = clear_dedup_memo
    # memoized rows are never re-run: a second sample would read the
    # memo in O(1) and erase the row's attribution
    NO_RETRY = chain_consumers | {"derive_graphs"}
    timings: dict[str, float] = {}
    probes: list[float] = [calibration]
    seg_index: dict[str, int] = {}
    for i, name in enumerate(headline):
        # CAL_EVERY <= 0 disables interleaved probes (pre/post pair only)
        if CAL_EVERY > 0 and i and i % CAL_EVERY == 0:
            probes.append(_calibrate())
        seg_index[name] = len(probes) - 1
        t = _run_once(name)
        if t > RETRY_FLOOR and name not in NO_RETRY:
            t2 = _run_once(name)
            print(f"  {name}: samples {t:.3f}s / {t2:.3f}s", file=sys.stderr)
            t = min(t, t2)
        timings[name] = t
        print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)
        hook = post_query.get(name)
        if hook is not None:
            hook()

    calibration_post = _calibrate()
    probes.append(calibration_post)
    brackets, noisy = compute_brackets(seg_index, probes)
    if noisy:
        print(
            f"  WARNING: {len(noisy)} queries ran inside a >"
            f"{NOISY_DRIFT}x calibration drift segment (host throttled): "
            f"{', '.join(noisy)} — treat those timings as upper bounds",
            file=sys.stderr,
        )
    drift = calibration_post / calibration if calibration else 1.0
    if drift > 1.2:
        print(
            f"  WARNING: calibration drifted {calibration:.3f}s -> "
            f"{calibration_post:.3f}s ({drift:.2f}x): the host was throttled "
            "mid-run; treat per-query timings as upper bounds and re-run on "
            "a quiet host",
            file=sys.stderr,
        )
    elif drift < 1 / 1.2:
        # post FASTER than pre is also a red flag (both probes are warmed):
        # the host was throttled at the START, inflating the early queries
        print(
            f"  WARNING: calibration drifted {calibration:.3f}s -> "
            f"{calibration_post:.3f}s ({drift:.2f}x): the host was throttled "
            "during the pre-run probe; early query timings are inflated — "
            "re-run on a quiet host",
            file=sys.stderr,
        )

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else None
    result = build_result(timings, sf, calibration, calibration_post,
                          brackets, noisy, retry_floor=RETRY_FLOOR)
    line = contract_line(result)
    # tail-budget guard: the driver keeps only the LAST 2,000 stdout chars.
    # r10-r13 printed the FULL artifact (brackets + drift, ~12 KB) as the
    # stdout line, so the driver's json parse of its captured tail always
    # failed (BENCH_r13.json: "parsed": null) and consumers fell back to
    # regex over the tail text. Since r14 the stdout line is the minimal
    # driver contract — metric/unit/sf/value/queries, ~1.9 KB at 79 rows —
    # which fits the tail whole, so the driver parses it again; the
    # diagnostics bulk moves entirely to the sidecar + stderr. Key order
    # stays tail-safe (value+queries LAST) so even a pathologically slow
    # host that widens every row keeps the timings inside the tail window.
    if len(line) > 1990:
        print(
            f"  WARNING: contract line serializes to {len(line)} chars — "
            "the driver's 2,000-char tail will truncate it; shrink the "
            "headline set or re-round before the next round",
            file=sys.stderr,
        )
    # sidecar: the committed tree keeps the bracket diagnostics that no
    # longer ride the stdout line. Subset runs (SPARK_GRAFT_BENCH_ONLY —
    # local iteration) skip it unless explicitly redirected, so they can
    # never clobber a full-run artifact.
    detail_path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL")
    if detail_path is None and not only:
        # keyed by core count so the driver's auxiliary scaling runs can't
        # clobber the committed full-run artifact (r14 VERDICT item 6)
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            detail_sidecar_name(CPUS))
    if detail_path:
        try:
            with open(detail_path, "w") as fh:
                json.dump(result, fh, indent=1)
                fh.write("\n")
        except OSError as exc:
            print(f"  WARNING: could not write bench detail sidecar: {exc}",
                  file=sys.stderr)
    # full diagnostics also on stderr so a sidecar-less subset run still
    # records its brackets somewhere inspectable
    print(json.dumps(result, separators=(",", ":")), file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
