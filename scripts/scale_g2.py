#!/usr/bin/env python
"""G2-class scale proof (BASELINE.md: G2 = soc-LiveJournal1, |V|=4,847,571,
|E|=68,993,773).

Builds a synthetic graph of the same size class — 4.8M vertices on a ring
with chords at every power of two up to N (dst = (id + 2^j) % N for
j = 0..ceil(log2 N)-1, 23 out-edges per vertex -> ~110M directed edges,
diameter <= 23 because any hop distance has a binary decomposition into the
available offsets) — entirely from ``spark.range`` (deterministic, no input
files), then runs the two headline iterative algorithms and prints ONE JSON
line with wall-clock timings. Note |E| is ~1.6x G2's 69M (the full power
ladder is what buys the log diameter) — the per-superstep message volume is
strictly harder than the reference's.

Reference numbers to compare against (cross-hardware; treat as class
markers, not absolutes — BASELINE.md's own caveat):
  SSSP  G2: GMR-MPI 146-151 s (3 procs, 15 supersteps); GraphX 23-50 min
  PageRank G2: GMR-MPI 5m36s (3 procs); GraphX n/a
The per-superstep message volume here (~67M messages/superstep dense) is the
same class as soc-LiveJournal1's.

Usage:  python scripts/scale_g2.py            # full size (~4.8M / 67M)
        G2_VERTICES=1000000 python scripts/scale_g2.py   # smaller dry run
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("G2_VERTICES", 4_800_000))
# full power-of-two ladder: offsets 2^0 .. 2^(ceil(log2 N)-1). Binary
# decomposition of any forward distance then bounds the diameter by
# ~log2(N) + popcount slack; a truncated ladder (e.g. 2^13 max) degrades to
# N/2^13 linear hops and BFS never finishes in bounded supersteps.
CHORDS = int(os.environ.get("G2_CHORDS", max(1, (N - 1).bit_length())))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import functions as F

    from gmr_spark.algorithms import pagerank, sssp
    from gmr_spark.graph import PropertyGraph
    from gmr_spark.session import get_session

    spark = get_session("g2_scale", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    n_parts = spark.sparkContext.defaultParallelism * 2

    timings: dict[str, float] = {}
    extra: dict[str, object] = {}

    # host-health probe (same fixed workload as bench.py's calibration,
    # ~0.25 s on an unloaded 32-core host): this container shares hardware
    # and external tenants have been observed to swing identical runs 3x
    # (round-5: PageRank 512 s on a loadavg-14 host vs 184 s round-3) — the
    # artifact records the probe so a poisoned row is self-identifying.
    from gmr_spark.session import calibration_probe

    def _calibrate() -> float:
        return calibration_probe(spark)

    _calibrate()  # warm codegen so the probe measures the host, not JIT
    extra["calibration_sec"] = _calibrate()

    t0 = time.perf_counter()
    offsets = F.array(*[F.lit(2**j) for j in range(CHORDS)])
    edges = (
        spark.range(N)
        .select(F.col("id"), F.explode(offsets).alias("off"))
        .select(
            F.col("id").alias("src"),
            F.pmod(F.col("id") + F.col("off"), F.lit(N)).alias("dst"),
            F.lit(1.0).alias("weight"),
        )
        .repartition(n_parts, "src")
        .localCheckpoint(eager=True)
    )
    # vertices are known by construction — no distinct over 2|E| endpoints
    vertices = spark.range(N).select(F.col("id")).localCheckpoint(eager=True)
    g = PropertyGraph(vertices=vertices, edges=edges)
    n_edges = edges.count()
    timings["build_graph"] = round(time.perf_counter() - t0, 1)
    print(f"graph: {N} vertices, {n_edges} edges "
          f"({timings['build_graph']}s)", file=sys.stderr)

    # G2_SKIP="sssp,pagerank" re-runs a single algorithm (e.g. TC) without
    # paying for the others; the committed SCALE.md artifact records which
    # rows came from which run.
    skip = {s.strip() for s in os.environ.get("G2_SKIP", "").split(",") if s.strip()}

    if "sssp" not in skip:
        t0 = time.perf_counter()
        # ci=1 arms the exact-census adaptive strategy (broadcast small
        # frontiers) — on this high-diameter graph most supersteps move a
        # tiny frontier, and ci=1 alone is worth ~7% at G2 (cadence sweep
        # below); measured together: 30.6 -> 21.7 s at N=1.2M (round 5)
        res = sssp(g, source=0, weighted=True, max_iter=CHORDS + 10,
                   checkpoint_interval=1)
        n_reached = res.filter(F.col("dist").isNotNull()).count()
        timings["sssp"] = round(time.perf_counter() - t0, 1)
        print(f"sssp: {n_reached} reached ({timings['sssp']}s)", file=sys.stderr)
        assert n_reached == N, f"expected all {N} reachable, got {n_reached}"

    if "pagerank" not in skip:
        t0 = time.perf_counter()
        pr = pagerank(g, k=10, damping=0.5)
        pr_rows = pr.count()
        timings["pagerank_k10"] = round(time.perf_counter() - t0, 1)
        print(f"pagerank: {pr_rows} rows ({timings['pagerank_k10']}s)",
              file=sys.stderr)
        assert pr_rows == N

    # Optional TriangleCount row (G2_RUN_TC=1): the reference's hardest
    # recorded G2 number (BASELINE.md sheet1: 16m47s-11m17s). The expected
    # count is EXACT and closed-form by translation invariance: every vertex
    # sees the same neighbor-offset structure (S = {±2^j mod N}), so
    # T = N * t0 / 3 where t0 = triangles incident to vertex 0 =
    # #{(u,v) in S, u<v, u~v} — a ~46-element pairwise check in pure Python.
    if os.environ.get("G2_RUN_TC", ""):
        from gmr_spark.algorithms.triangles import triangle_count

        offs = sorted({pow(2, j, N) for j in range(CHORDS)} - {0})
        adj = set(offs) | {(N - d) % N for d in offs}
        nbrs = sorted(adj)  # neighbors of vertex 0
        t0 = sum(
            1
            for i, u in enumerate(nbrs)
            for v in nbrs[i + 1:]
            if (v - u) % N in adj or (u - v) % N in adj
        )
        expected = N * t0 // 3
        assert (N * t0) % 3 == 0, (N, t0)
        t0_time = time.perf_counter()
        # 110M canonical edges > the closure-broadcast cap -> shuffle_hash
        # probe, BY MEASUREMENT not just by the cap: an A/B at N=1.2M
        # (round 5) put the broadcast probe at 32.2/29.6 s vs 23.6/22.7 s
        # for the shuffle — on this REGULAR graph the wedge amplification
        # is only ~11x E, and per-partition build maps are cache-resident
        # while a 25M-entry broadcast map is not. At FULL size the broadcast
        # path is not merely slower, it is impossible: the 110M-entry
        # hashed relation hits Spark's hard 8 GiB broadcast cap (attempted
        # round 5, BroadcastExchangeExec abort). The broadcast probe wins
        # on SKEWED small-edge-set graphs (hub_tri class) where the wedge
        # stream dwarfs the edge set.
        got = triangle_count(g).first().tri_cnt
        timings["triangle_count"] = round(time.perf_counter() - t0_time, 1)
        print(f"triangles: {got} (expected {expected}, "
              f"{timings['triangle_count']}s)", file=sys.stderr)
        assert got == expected, f"triangle count {got} != expected {expected}"

    # Optional k-truss row (G2_RUN_TRUSS=1): support-peel at G2-class size
    # on a hub_tri-shaped power-law graph built from spark.range (same
    # structure as the sf fixtures' hub_tri, N spokes + 6 hubs). The
    # 3-truss has a CLOSED-FORM surviving edge count: ring (N) + chord (N)
    # + hub-0-to-even-spoke (N/2) = 2.5N — hub 1-5 edges sit only in open
    # wedges and peel in round one; everything else carries triangles.
    if os.environ.get("G2_RUN_TRUSS", ""):
        from gmr_spark.algorithms.triangles import k_truss

        TN = int(os.environ.get("TRUSS_VERTICES", N))
        assert TN % 2 == 0
        t0 = time.perf_counter()
        rid = F.col("id")
        hub = (
            F.when(rid % 2 == 0, 0)
            .when(rid % 4 == 1, 1)
            .when(rid % 8 == 3, 2)
            .when(rid % 16 == 7, 3)
            .when(rid % 32 == 15, 4)
            .otherwise(5)
        )
        spokes = spark.range(TN).select(rid.alias("rid"), hub.alias("hub"))
        w = F.lit(1.0).alias("weight")
        tedges = (
            spokes.select((F.lit(1000) + F.col("rid")).alias("src"),
                          F.col("hub").cast("bigint").alias("dst"), w)
            .unionAll(spokes.select(
                (F.lit(1000) + F.col("rid")).alias("src"),
                (F.lit(1000) + (F.col("rid") + 1) % TN).alias("dst"), w))
            .unionAll(spokes.select(
                (F.lit(1000) + F.col("rid")).alias("src"),
                (F.lit(1000) + (F.col("rid") + 2) % TN).alias("dst"), w))
            .repartition(n_parts, "src")
            .localCheckpoint(eager=True)
        )
        tg = PropertyGraph(
            # exact endpoint set: hubs 0-5 plus spokes offset by 1000 —
            # NOT range(TN+6), which would miss the last 994 spoke ids and
            # invent 994 phantom vertices (k_truss itself is edge-only, but
            # the graph must stay valid for any vertex-consuming extension)
            vertices=spark.range(6).select(F.col("id")).unionAll(
                spark.range(1000, 1000 + TN).select(F.col("id"))),
            edges=tedges,
        )
        truss = k_truss(tg, k=3, max_iter=6).localCheckpoint(eager=True)
        n_truss = truss.count()
        timings["ktruss3"] = round(time.perf_counter() - t0, 1)
        expected_truss = TN + TN + TN // 2
        print(f"ktruss3: {n_truss} edges (expected {expected_truss}, "
              f"{timings['ktruss3']}s)", file=sys.stderr)
        assert n_truss == expected_truss, (n_truss, expected_truss)
        extra["ktruss"] = {"vertices": TN + 6, "surviving_edges": n_truss,
                           "expected": expected_truss}

    # ---- round-7 G2-class rows for the remaining iterative algorithms ----
    # (verdict r6 item 2: CC/SCC/MST/k-core/LPA had only sf0.1 bench
    # evidence; these are the loops whose join-per-round shape could hide a
    # scale constant). Every row asserts a CLOSED-FORM invariant of a
    # designed graph — wall-clock alone proves nothing.

    if os.environ.get("G2_RUN_CC", ""):
        # M disjoint chord rings of B = N/M vertices each: the min-label +
        # pointer-jump loop must converge to exactly M components labeled by
        # each block's minimum id {0, B, 2B, ...}, each of size B. The
        # within-block power ladder keeps diameter ~log2(B), so convergence
        # exercises both the propagation join AND the jump loop.
        from gmr_spark.algorithms.cc import connected_components

        M = int(os.environ.get("CC_BLOCKS", 4))
        B = N // M
        assert N % M == 0
        bchords = max(1, (B - 1).bit_length())
        t0 = time.perf_counter()
        boffs = F.array(*[F.lit(2**j) for j in range(bchords)])
        block = F.col("id") - F.pmod(F.col("id"), F.lit(B))
        cc_edges = (
            spark.range(N)
            .select(F.col("id"), F.explode(boffs).alias("off"))
            .select(
                F.col("id").alias("src"),
                (block + F.pmod(F.col("id") - block + F.col("off"), F.lit(B))
                 ).alias("dst"),
                F.lit(1.0).alias("weight"),
            )
            .repartition(n_parts, "src")
            .localCheckpoint(eager=True)
        )
        cc_g = PropertyGraph(
            vertices=spark.range(N).select("id").localCheckpoint(eager=True),
            edges=cc_edges)
        n_cc_edges = cc_edges.count()
        comp = connected_components(cc_g)
        sizes = sorted(
            (r.component, r.cnt)
            for r in comp.groupBy("component")
            .agg(F.count(F.lit(1)).alias("cnt")).collect()
        )
        timings["cc"] = round(time.perf_counter() - t0, 1)
        print(f"cc: {len(sizes)} components ({timings['cc']}s)",
              file=sys.stderr)
        assert sizes == [(m * B, B) for m in range(M)], sizes[:8]
        extra["cc"] = {"edges": n_cc_edges, "components": len(sizes)}

    if os.environ.get("G2_RUN_SCC", ""):
        # L layers of B = N/L vertices: each layer is a chord ring (strongly
        # connected, log diameter) and every vertex also points one layer
        # forward — the condensation is a PATH of L SCCs, so the
        # forward-backward peel must emit exactly L components of size B
        # labeled {0, B, 2B, ...}, peeling one per phase. Default L=2: each
        # phase's color loop is a FULL ~log2(B)-superstep min-propagation
        # over the whole remaining graph (~N active per superstep — the
        # worst-case Pregel shape, unlike SSSP's thin frontiers), so phases
        # are the expensive axis and two of them already prove the peel.
        from gmr_spark.algorithms.scc import strongly_connected_components

        L = int(os.environ.get("SCC_LAYERS", 2))
        B = N // L
        assert N % L == 0
        bchords = max(1, (B - 1).bit_length())
        t0 = time.perf_counter()
        boffs = F.array(*[F.lit(2**j) for j in range(bchords)])
        block = F.col("id") - F.pmod(F.col("id"), F.lit(B))
        ring = (
            spark.range(N)
            .select(F.col("id"), F.explode(boffs).alias("off"))
            .select(
                F.col("id").alias("src"),
                (block + F.pmod(F.col("id") - block + F.col("off"), F.lit(B))
                 ).alias("dst"))
        )
        fwd = (
            spark.range(N - B)
            .select(F.col("id").alias("src"), (F.col("id") + B).alias("dst"))
        )
        scc_edges = (
            ring.unionAll(fwd)
            .select("src", "dst", F.lit(1.0).alias("weight"))
            .repartition(n_parts, "src")
            .localCheckpoint(eager=True)
        )
        scc_g = PropertyGraph(
            vertices=spark.range(N).select("id").localCheckpoint(eager=True),
            edges=scc_edges)
        n_scc_edges = scc_edges.count()
        scc = strongly_connected_components(scc_g)
        ssizes = sorted(
            (r.scc, r.cnt)
            for r in scc.groupBy("scc").agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        timings["scc"] = round(time.perf_counter() - t0, 1)
        print(f"scc: {len(ssizes)} sccs ({timings['scc']}s)", file=sys.stderr)
        assert ssizes == [(m * B, B) for m in range(L)], ssizes[:8]
        extra["scc"] = {"edges": n_scc_edges, "sccs": len(ssizes)}

    if os.environ.get("G2_RUN_MST", ""):
        # Chord ring with weight = offset, minus every 4th unit ring edge:
        # the 3N/4 surviving weight-1 edges are forced into the forest (they
        # are acyclic), and the N/4 blocks they form must be bridged by
        # N/4 - 1 weight-2 chords — unique MSF weight 3N/4 + 2(N/4 - 1) =
        # 1.25N - 2 over exactly N - 1 edges, reached only if Borůvka's
        # pick-merge loop and the component-graph collapse both hold at
        # 110M canonical edges.
        from gmr_spark.algorithms.mst import minimum_spanning_forest

        t0 = time.perf_counter()
        mst_edges = (
            spark.range(N)
            .select(F.col("id"), F.explode(offsets).alias("off"))
            .filter(~((F.col("off") == 1) & (F.pmod(F.col("id"), F.lit(4)) == 3)))
            .select(
                F.col("id").alias("src"),
                F.pmod(F.col("id") + F.col("off"), F.lit(N)).alias("dst"),
                F.col("off").cast("double").alias("weight"),
            )
            .repartition(n_parts, "src")
            .localCheckpoint(eager=True)
        )
        mst_g = PropertyGraph(
            vertices=spark.range(N).select("id").localCheckpoint(eager=True),
            edges=mst_edges)
        n_mst_edges = mst_edges.count()
        forest = minimum_spanning_forest(mst_g).localCheckpoint(eager=True)
        agg = forest.agg(
            F.count(F.lit(1)).alias("n"), F.sum("weight").alias("w")).first()
        timings["mst"] = round(time.perf_counter() - t0, 1)
        print(f"mst: {agg.n} edges, weight {agg.w} ({timings['mst']}s)",
              file=sys.stderr)
        assert agg.n == N - 1, (agg.n, N - 1)
        assert abs(agg.w - (1.25 * N - 2)) < 0.5, (agg.w, 1.25 * N - 2)
        extra["mst"] = {"edges_in": n_mst_edges, "forest_edges": agg.n,
                        "forest_weight": agg.w}

    if os.environ.get("G2_RUN_KCORE", ""):
        # Chord ring (every vertex 46-regular undirected) + a planted K_60
        # clique on ids 0..59 + T degree-1 tail vertices each hooked to a
        # distinct ring vertex >= 60. k = 47 peels in a designed cascade:
        # round 1 drops tails and untailed ring vertices (deg 46), round 2
        # drops the tailed ring vertices (their tail is gone, <= 46 chord
        # neighbors remain), round 3 confirms the clique fixpoint — the
        # surviving 47-core is EXACTLY the 60 clique vertices at induced
        # degree 59.
        from gmr_spark.algorithms.kcore import k_core

        T = int(os.environ.get("KCORE_TAILS", 1_000_000))
        assert T <= N - 60
        t0 = time.perf_counter()
        clique = (
            spark.range(60).select(F.col("id").alias("src"))
            .crossJoin(spark.range(60).select(F.col("id").alias("dst")))
            .filter(F.col("src") < F.col("dst"))
        )
        tails = spark.range(T).select(
            (F.lit(N) + F.col("id")).alias("src"),
            (F.lit(60) + F.col("id")).alias("dst"))
        kc_edges = (
            edges.select("src", "dst")
            .unionAll(clique)
            .unionAll(tails)
            .select("src", "dst", F.lit(1.0).alias("weight"))
            .repartition(n_parts, "src")
            .localCheckpoint(eager=True)
        )
        kc_g = PropertyGraph(
            vertices=spark.range(N + T).select("id").localCheckpoint(eager=True),
            edges=kc_edges)
        n_kc_edges = kc_edges.count()
        core = k_core(kc_g, k=47).localCheckpoint(eager=True)
        kagg = core.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("core_degree").alias("dmin"),
            F.max("core_degree").alias("dmax"),
            F.max("id").alias("idmax")).first()
        timings["kcore47"] = round(time.perf_counter() - t0, 1)
        print(f"kcore47: {kagg.n} vertices ({timings['kcore47']}s)",
              file=sys.stderr)
        assert (kagg.n, kagg.dmin, kagg.dmax) == (60, 59, 59), kagg
        assert kagg.idmax == 59, kagg
        extra["kcore"] = {"edges": n_kc_edges, "tails": T,
                          "core_vertices": kagg.n}

    if os.environ.get("G2_RUN_LPA", ""):
        # N/24 disjoint 24-cliques (both edge directions) = N*23 directed
        # edges, exactly the G2 message-volume class. Synchronous LPA with
        # min tie-break converges on a clique in <= 3 rounds to the clique's
        # minimum id, so after the default k=4 every vertex must carry label
        # id - id % 24 — checked exactly, zero mismatches allowed.
        from gmr_spark.algorithms.lpa import label_propagation

        S = 24
        assert N % S == 0
        t0 = time.perf_counter()
        doffs = F.array(*[F.lit(d) for d in range(1, S)])
        cbase = F.col("id") - F.pmod(F.col("id"), F.lit(S))
        lpa_edges = (
            spark.range(N)
            .select(F.col("id"), F.explode(doffs).alias("d"))
            .select(
                F.col("id").alias("src"),
                (cbase + F.pmod(F.col("id") - cbase + F.col("d"), F.lit(S))
                 ).alias("dst"),
                F.lit(1.0).alias("weight"),
            )
            .repartition(n_parts, "src")
            .localCheckpoint(eager=True)
        )
        lpa_g = PropertyGraph(
            vertices=spark.range(N).select("id").localCheckpoint(eager=True),
            edges=lpa_edges)
        n_lpa_edges = lpa_edges.count()
        lab = label_propagation(lpa_g, k=4).localCheckpoint(eager=True)
        mism = lab.filter(
            F.col("label") != F.col("id") - F.pmod(F.col("id"), F.lit(S))
        ).count()
        n_lab = lab.select("label").distinct().count()
        timings["lpa"] = round(time.perf_counter() - t0, 1)
        print(f"lpa: {n_lab} communities, {mism} mismatches "
              f"({timings['lpa']}s)", file=sys.stderr)
        assert mism == 0 and n_lab == N // S, (mism, n_lab)
        extra["lpa"] = {"edges": n_lpa_edges, "communities": n_lab}

    if os.environ.get("G2_RUN_MATMUL", ""):
        # C = A·A for A = the 10-chord adjacency of an NM-ring: nnz(A) =
        # 10·NM, the inner join streams 100·NM product terms, and by
        # translation invariance C has exactly |{2^a + 2^b}| = 55 distinct
        # offsets -> nnz(C) = 55·NM (~110M at NM = 2M) with value-sum
        # 100·NM — both closed-form, both asserted from one aggregate.
        from gmr_spark.algorithms.matmul import matmul_coo

        NM = int(os.environ.get("MATMUL_N", 2_000_000))
        MC = 10
        t0 = time.perf_counter()
        moffs = F.array(*[F.lit(2**j) for j in range(MC)])
        A = (
            spark.range(NM)
            .select(F.col("id"), F.explode(moffs).alias("off"))
            .select(
                F.col("id").alias("i"),
                F.pmod(F.col("id") + F.col("off"), F.lit(NM)).alias("j"),
                F.lit(1.0).alias("v"),
            )
            .repartition(n_parts, "i")
            .localCheckpoint(eager=True)
        )
        C = matmul_coo(A, A)
        magg = C.agg(F.count(F.lit(1)).alias("nnz"),
                     F.sum("v").alias("vsum")).first()
        timings["matmul"] = round(time.perf_counter() - t0, 1)
        print(f"matmul: nnz {magg.nnz}, sum {magg.vsum} "
              f"({timings['matmul']}s)", file=sys.stderr)
        n_sums = len({2**a + 2**b for a in range(MC) for b in range(MC)})
        assert magg.nnz == n_sums * NM, (magg.nnz, n_sums * NM)
        assert abs(magg.vsum - MC * MC * NM) < 0.5, magg.vsum
        extra["matmul"] = {"n": NM, "nnz_a": MC * NM, "nnz_c": magg.nnz}

    # Optional checkpoint-cadence sweep (G2_CADENCE_SWEEP="1,3"): re-times
    # PageRank at the given checkpoint_intervals to confirm the k=2 default
    # (measured on the 600k fixture; see run_pregel scale notes) still wins
    # at this graph size. k=2 is the pagerank_k10 row above.
    sweep = os.environ.get("G2_CADENCE_SWEEP", "")
    if sweep:
        for ci in (int(x) for x in sweep.split(",")):
            t0 = time.perf_counter()
            rows = pagerank(g, k=10, damping=0.5, checkpoint_interval=ci).count()
            timings[f"pagerank_k10_ci{ci}"] = round(time.perf_counter() - t0, 1)
            print(f"pagerank ci={ci}: {rows} rows "
                  f"({timings[f'pagerank_k10_ci{ci}']}s)", file=sys.stderr)

    extra["calibration_post_sec"] = _calibrate()
    print(json.dumps({
        "metric": "g2_scale_proof",
        "vertices": N,
        "edges": n_edges,
        "cpus": int(CPUS),
        "timings_sec": timings,
        "unit": "sec",
        **extra,
    }))


if __name__ == "__main__":
    main()
