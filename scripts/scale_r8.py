#!/usr/bin/env python
"""Round-8 G2-class scale rows: heavy-tailed degree skew + many-SCC peel.

Two designed graphs, each with exact invariants (wall-clock alone proves
nothing — the scale_g2.py discipline):

R8_RUN_SKEW=1 — the heavy-tail hub graph (round-7 verdict item 1, the one
SURVEY §4 risk with no at-scale evidence). 4.8M vertices:
  - background: circulant with 20 chord offsets S (every vertex out-degree
    ≥ 20, no dangling) -> 96M directed edges, weight 1.0;
  - hubs: vertices 0..99 receive designed in-edge sets A_h (weight 2.0):
    hub 0 ~1M in-edges, hubs 1-9 ~500k, hubs 10-99 ~100k (14.5M hub edges,
    max in-degree ~1e6 — 50x past soc-LiveJournal1's ~20k hub ceiling).
  Triangle-exactness by construction (every case enumerated in
  _build_hub_edges's docstring): S has min >= 101 (hubs pairwise
  non-adjacent), no multiples of 4 (within-hub source pairs are 4-strided),
  and each A_h excludes the ~1.6k offsets D2 = {±s±s'} that could close a
  background wedge onto a hub edge — so the triangle count equals the
  background closed form V*T2 EXACTLY, where T2 = #{(a,b) in S², a<b,
  b-a in S} (wrap-around triples a+b+c=V asserted absent).
  Value oracle: an independent numpy PageRank (np.roll per chord +
  np.bincount over the hub edges — the same multi-edge semantics as the
  engine) checks all 4.8M ranks, not just invariants.
  AQE-skew observation: the declared plan shapes never build a skewed JOIN
  from dst-skew (message joins key on src; groupBy(dst) is absorbed by
  partial aggregation) — measured here via the executed plans; the one
  surface that DOES join on dst (the GraphX triplets view) is run twice,
  default conf and tuned skew thresholds, and the executed plan is grepped
  for AQE skew splitting. See SCALE.md for the write-up.

R8_RUN_MANYSCC=1 — 1,000 SCCs at the G2 edge class (round-7 verdict
item 2). 4 condensation levels x 250 SCCs per level; each SCC is a
4,800-vertex circulant (23 chords: the full power-of-2 ladder + 3*2^j
fillers, diameter ~13) -> 110.4M intra edges + 1,500 forward bridges.
Ids are ADVERSARIAL (increase along the condensation order — the layout
that degenerates raw min-id coloring to one peel per phase; the scrambled
(xxhash64, id) coloring key makes the phase count layout-independent,
pinned at unit scale in tests/test_fixtures_graph.py). Invariants: exactly
1,000 SCCs, each of size 4,800, labeled by its block minimum. Phase count,
trim count and color supersteps are recorded from metrics_out.

Usage: R8_RUN_SKEW=1 python scripts/scale_r8.py
       R8_RUN_MANYSCC=1 python scripts/scale_r8.py
       R8_VERTICES=480000 R8_RUN_SKEW=1 ... (smaller dry run, scales hubs)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # scale_llm

V = int(os.environ.get("R8_VERTICES", 4_800_000))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SCALE = V / 4_800_000  # hub degrees scale with the dry-run size

# Chord offsets: values ≡1 (mod 4) + 3 deliberate sums ≡2 (mod 4) — each
# sum closes triangles with its two addends, so T2 > 0 and the triangle
# assertion is non-vacuous. Constraints asserted in _check_s(); the
# geometric tail adapts to dry-run V (3*max(S) < V must hold).
def _s_offsets(v: int) -> list[int]:
    ones = [101, 105, 305, 1001, 2005, 3001, 5005, 7001, 10001, 20005,
            30001, 40001]
    x = 50_001  # 50000·2^j + 1 ≡ 1 (mod 4): 50000 ≡ 0 (mod 16)
    while len(ones) < 17 and 3 * x < v:
        ones.append(x)
        x = (x - 1) * 2 + 1
    return ones + [206, 406, 1306]  # 101+105, 101+305, 305+1001


S_OFFSETS = _s_offsets(V)

HUB_PLAN = [(0, 1_000_000)] + [(h, 500_000) for h in range(1, 10)] + \
           [(h, 100_000) for h in range(10, 100)]
# first candidate source id (clear of the hubs; scaled so the widest A_h's
# 4-strided span stays inside the id space on dry runs)
SOURCE_ZONE = max(200, V // 24)


def _check_s() -> int:
    """Validate S and return T2 (background triangles per vertex)."""
    s = S_OFFSETS
    assert len(set(s)) == len(s) >= 10
    assert min(s) >= 101, "hub pairs must be non-adjacent"
    assert all(x % 4 != 0 for x in s), "A_h strides are 4"
    assert 3 * max(s) < V, "wrap-around triple guard"
    sset = set(s)
    t2 = sum(1 for i, a in enumerate(s) for b in s[i + 1:]
             if abs(b - a) in sset)
    # no wrap-around triangles: a+b+c == V over all (multi)triples
    assert not any(a + b + c == V for a in s for b in s for c in s)
    return t2


def _build_hub_edges():
    """numpy (hub_src, hub_dst) with the D2 exclusions applied.

    Triangle cases this construction forecloses (hub edge = undirected pair
    {u, h}, u in A_h):
      {u,u',h}, u,u' in A_h ........ |u-u'| ≡ 0 (mod 4), never in S;
      {u,h,h'} (shared source) ..... needs edge (h,h'): hub ids differ <=99
                                     < min(S), and hubs are never sources;
      {u,h,w}, w = h±s background .. needs |u-w| in S, i.e. u-h in ±s±s' =
                                     D2 — excluded per hub;
      duplicate {u,h} also in the background circulant adds no NEW pair, so
      the undirected triangle census is V*T2 regardless.
    """
    import numpy as np

    d2 = sorted({ds * a + dp * b for a in S_OFFSETS for b in S_OFFSETS
                 for ds in (1, -1) for dp in (1, -1)})
    srcs, dsts = [], []
    for h, deg in HUB_PLAN:
        deg = max(1, int(deg * SCALE))
        r_h = h % 4
        cand = SOURCE_ZONE + r_h + 4 * np.arange(deg, dtype=np.int64)
        assert int(cand[-1]) < V, "source zone overflows the id space"
        excl = (np.asarray(d2, dtype=np.int64) + h) % V
        keep = cand[~np.isin(cand, excl)]
        srcs.append(keep)
        dsts.append(np.full(len(keep), h, dtype=np.int64))
    return np.concatenate(srcs), np.concatenate(dsts)


def _numpy_pagerank(hub_src, hub_dst, k: int = 10, d: float = 0.5):
    """Independent oracle with the engine's exact semantics (pagerank.py:
    init 1.0, msg rank/outdeg per DIRECTED edge incl. parallel edges,
    update d*sum + (1-d)/N; every vertex has >= |S| in-edges so the
    keep-prior-value branch never fires)."""
    import numpy as np

    outdeg = np.full(V, len(S_OFFSETS), dtype=np.float64)
    outdeg += np.bincount(hub_src, minlength=V)
    rank = np.ones(V, dtype=np.float64)
    for _ in range(k):
        contrib = rank / outdeg
        incoming = np.zeros(V, dtype=np.float64)
        for s in S_OFFSETS:
            incoming += np.roll(contrib, s)  # u -> (u+s) % V
        incoming += np.bincount(hub_dst, weights=contrib[hub_src],
                                minlength=V)
        rank = d * incoming + (1.0 - d) / V
    return rank


def _grep_skew(df) -> dict:
    """Execute-and-inspect THE SAME QueryExecution: ``df.count()`` would
    plan a separate aggregate query, leaving ``df``'s own adaptive plan
    unexecuted — ``queryExecution().toRdd().count()`` drives this exact
    plan, so ``executedPlan()`` afterwards is the finalized AQE plan."""
    qe = df._jdf.queryExecution()
    n = qe.toRdd().count()
    plan = qe.executedPlan().toString()
    return {"rows": int(n),
            "skew_split": "skew" in plan.lower(),
            "aqe_final": "isFinalPlan=true" in plan}


def run_skew(spark, timings, extra):
    import numpy as np
    from pyspark.sql import functions as F

    from gmr_spark.algorithms import pagerank
    from gmr_spark.algorithms.triangles import triangle_count
    from gmr_spark.graph import PropertyGraph

    t2 = _check_s()
    n_parts = spark.sparkContext.defaultParallelism * 2

    t0 = time.perf_counter()
    hub_src, hub_dst = _build_hub_edges()
    # ship the EXACT hub edge set to Spark through parquet (identity with
    # the oracle arrays by construction, and a realistic scan path)
    import pyarrow as pa
    import pyarrow.parquet as pq

    hub_path = f"/tmp/gmr_r8_hub_edges_{V}.parquet"
    pq.write_table(pa.table({"src": hub_src, "dst": hub_dst}), hub_path)

    offsets = F.array(*[F.lit(int(s)) for s in S_OFFSETS])
    bg = (
        spark.range(V)
        .select(F.col("id"), F.explode(offsets).alias("off"))
        .select(F.col("id").alias("src"),
                F.pmod(F.col("id") + F.col("off"), F.lit(V)).alias("dst"),
                F.lit(1.0).alias("weight"))
    )
    hub = spark.read.parquet(hub_path).select(
        "src", "dst", F.lit(2.0).alias("weight"))
    edges = (bg.unionByName(hub)
             .repartition(n_parts, "src")
             .localCheckpoint(eager=True))
    vertices = spark.range(V).select("id").localCheckpoint(eager=True)
    g = PropertyGraph(vertices=vertices, edges=edges)
    n_edges = edges.count()
    timings["build_graph"] = round(time.perf_counter() - t0, 1)
    assert n_edges == V * len(S_OFFSETS) + len(hub_src), n_edges
    print(f"skew graph: {V} V, {n_edges} E (hub max in-deg "
          f"{int(np.bincount(hub_dst).max())}) "
          f"({timings['build_graph']}s)", file=sys.stderr)

    only_triplets = os.environ.get("R8_SKEW_ONLY_TRIPLETS", "") == "1"
    if only_triplets:
        _skew_triplets(spark, g, vertices, edges, n_edges, timings, extra)
        return

    # --- weighted in-degree (the skewed groupBy(dst), SURVEY §4 risk 2) ---
    t0 = time.perf_counter()
    win = g.aggregate_messages(to_dst=F.col("weight"), agg=F.sum("msg"),
                               msg_name="msg")
    got = {r.id: r.agg for r in win.filter(F.col("id") < 100).collect()}
    total = win.agg(F.sum("agg").alias("t")).first().t
    timings["weighted_indegree"] = round(time.perf_counter() - t0, 1)
    hub_in = np.bincount(hub_dst, minlength=100)
    for h in range(100):
        want = len(S_OFFSETS) * 1.0 + 2.0 * int(hub_in[h])
        assert got[h] == want, (h, got[h], want)
    assert total == n_edges * 1.0 + len(hub_src) * 1.0, total
    print(f"weighted_indegree: hubs exact "
          f"({timings['weighted_indegree']}s)", file=sys.stderr)

    # --- PageRank k=10 vs the full numpy value oracle -----------------
    t0 = time.perf_counter()
    pr = pagerank(g, k=10, damping=0.5)
    pdf = pr.toPandas().sort_values("id")
    timings["pagerank_k10"] = round(time.perf_counter() - t0, 1)
    want = _numpy_pagerank(hub_src, hub_dst)
    got_r = pdf["rank"].to_numpy()
    assert len(got_r) == V
    rel = np.abs(got_r - want) / want
    assert float(rel.max()) < 1e-6, float(rel.max())
    # reference semantics: per-vertex teleport is (1-d)/N, so TOTAL mass
    # contracts toward 1 — T' = d·T + (1-d), closed form after k steps
    # from T0 = N: T_k = d^k·(N-1) + 1 (no dangling vertices here)
    want_mass = 0.5 ** 10 * (V - 1) + 1
    assert abs(float(got_r.sum()) - want_mass) / want_mass < 1e-9
    extra["pagerank_max_rel_err"] = float(rel.max())
    extra["hub0_rank_ratio_vs_median"] = float(
        got_r[0] / np.median(got_r))
    print(f"pagerank: 4.8M ranks match numpy oracle, max rel err "
          f"{rel.max():.2e} ({timings['pagerank_k10']}s)", file=sys.stderr)

    # --- triangle count: exact closed form under 1e6-degree hubs ------
    if os.environ.get("R8_SKEW_TC", "1") != "0":
        t0 = time.perf_counter()
        cnt = triangle_count(g).first().tri_cnt
        timings["triangle_count"] = round(time.perf_counter() - t0, 1)
        assert cnt == V * t2, (cnt, V * t2)
        print(f"triangles: {cnt} == V*T2 ({timings['triangle_count']}s)",
              file=sys.stderr)

    _skew_triplets(spark, g, vertices, edges, n_edges, timings, extra)


def _skew_triplets(spark, g, vertices, edges, n_edges, timings, extra):
    """The dst-keyed join surface: does AQE skew-split fire?

    triplets joins edges⋈vertices on src then dst: dst=hub0 holds ~1M of
    110M rows. Two runs: (a) session defaults — local-mode's 32 shuffle
    partitions pack ~150k distinct dst keys per partition, so even a 1M-row
    hot key is diluted below AQE's 5x-median skew bar (the honest local
    finding); (b) cluster-realistic partitioning (2048 shuffle partitions —
    what a 1000-executor job would run) + tuned skew thresholds: the hot
    key then dominates its partition ~19x over median and AQE must split
    it. Row counts asserted identical both ways."""
    from pyspark.sql import functions as F

    from gmr_spark.graph import PropertyGraph

    # the vertex attribute carries 8 B/row of entropy (xxhash64), like a
    # real payload column would — a derived low-entropy attr (id % 1000 +
    # constant weight) lets lz4 crush the hot partition's 40 B rows to a
    # few bytes each and the compressed-size skew detector (thresholds act
    # on compressed map-output bytes) never trips: measured, the SAME join
    # fires with an entropy attr and stays silent with a constant one
    attrs = vertices.select("id", F.xxhash64("id").alias("grp"))
    ag = PropertyGraph(vertices=attrs, edges=edges)
    t0 = time.perf_counter()
    extra["triplets_default"] = _grep_skew(ag.triplets())
    timings["triplets_default"] = round(time.perf_counter() - t0, 1)

    # two cluster-realistic partition counts bracketing Spark's
    # spark.shuffle.minNumPartitionsToHighlyCompress cutoff (2000): at 1024
    # reduce partitions map statuses carry EXACT per-block sizes and the
    # skew rule must fire; at 2048 they switch to HighlyCompressedMapStatus,
    # which averages every block below spark.shuffle.accurateBlockThreshold
    # (100 MB default) — the detector goes BLIND to this hub (its per-map
    # blocks are ~100 KB-1 MB) and skew_split=false is the EXPECTED, and
    # important, result. Verified root cause (same join, fresh sessions):
    # raising minNumPartitionsToHighlyCompress or lowering
    # accurateBlockThreshold to 16k — both static core confs — restores
    # detection at 2048. See SCALE.md round 8 for the 100 TB guidance.
    tuned_common = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512k",
        # forced SMJ: the |V|-row attr side must not broadcast, or there
        # is no shuffled dst partition to split
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"}
    for parts, key in ((1024, "triplets_parts_1024"),
                       (2048, "triplets_parts_2048")):
        saved = {}
        tuned = dict(tuned_common,
                     **{"spark.sql.shuffle.partitions": str(parts)})
        for k_, v_ in tuned.items():
            saved[k_] = spark.conf.get(k_, None)
            spark.conf.set(k_, v_)
        try:
            t0 = time.perf_counter()
            extra[key] = _grep_skew(ag.triplets())
            timings[key] = round(time.perf_counter() - t0, 1)
        finally:
            for k_, v_ in saved.items():
                if v_ is None:
                    spark.conf.unset(k_)
                else:
                    spark.conf.set(k_, v_)
        assert extra[key]["rows"] == n_edges
    assert extra["triplets_default"]["rows"] == n_edges
    assert extra["triplets_parts_1024"]["skew_split"], \
        "skew rule must fire below the HighlyCompressed cutoff"
    assert not extra["triplets_parts_2048"]["skew_split"], \
        "expected HighlyCompressedMapStatus blindness at 2048 partitions"
    print(f"triplets: default={extra['triplets_default']['skew_split']}, "
          f"parts1024={extra['triplets_parts_1024']['skew_split']}, "
          f"parts2048={extra['triplets_parts_2048']['skew_split']}",
          file=sys.stderr)


def run_manyscc(spark, timings, extra):
    from pyspark.sql import functions as F

    from gmr_spark.algorithms.scc import strongly_connected_components
    from gmr_spark.graph import PropertyGraph

    K = int(os.environ.get("R8_SCC_COUNT", 1000))
    LEVELS = int(os.environ.get("R8_SCC_LEVELS", 4))
    B = V // K
    per_level = K // LEVELS
    assert V % K == 0 and K % LEVELS == 0
    n_parts = spark.sparkContext.defaultParallelism * 2

    # 23 chords: power-of-2 ladder (diameter ~log2 B) + 3*2^j fillers to
    # reach the G2 per-vertex edge budget without raising the diameter
    # (dry runs with small B simply get fewer fillers)
    ladder = [2 ** j for j in range((B - 1).bit_length())]
    extra_offs = [3 * 2 ** j for j in range(max(0, 23 - len(ladder)))]
    offs = sorted({o for o in ladder + extra_offs if o < B})
    assert len(offs) >= (B - 1).bit_length()

    t0 = time.perf_counter()
    boffs = F.array(*[F.lit(o) for o in offs])
    block = F.col("id") - F.pmod(F.col("id"), F.lit(B))
    intra = (
        spark.range(V)
        .select(F.col("id"), F.explode(boffs).alias("off"))
        .select(F.col("id").alias("src"),
                (block + F.pmod(F.col("id") - block + F.col("off"),
                                F.lit(B))).alias("dst"))
    )
    # bridges: SCC s (level l < LEVELS-1) -> SCCs s+per_level and
    # s+per_level+1 (wrapped within the next level) — a DAG cone, ids
    # strictly increasing along the condensation order (ADVERSARIAL for
    # raw min-id coloring)
    sccs = spark.range(K - per_level).select(F.col("id").alias("s"))
    nxt_same = (F.col("s") + per_level) * B
    b1 = sccs.select((F.col("s") * B).alias("src"), nxt_same.alias("dst"))
    # rotated bridge: next level, neighbor SCC (wraps within the level)
    lvl_base = (F.col("s") - F.pmod(F.col("s"), F.lit(per_level))
                + per_level)
    rot = lvl_base + F.pmod(F.pmod(F.col("s"), F.lit(per_level)) + 1,
                            F.lit(per_level))
    b2 = sccs.select((F.col("s") * B).alias("src"), (rot * B).alias("dst"))
    edges = (
        intra.unionByName(b1).unionByName(b2)
        .select("src", "dst", F.lit(1.0).alias("weight"))
        .repartition(n_parts, "src")
        .localCheckpoint(eager=True)
    )
    g = PropertyGraph(
        vertices=spark.range(V).select("id").localCheckpoint(eager=True),
        edges=edges)
    n_edges = edges.count()
    timings["build_graph_scc"] = round(time.perf_counter() - t0, 1)
    print(f"manyscc graph: {V} V, {n_edges} E, {K} SCCs in {LEVELS} levels "
          f"({timings['build_graph_scc']}s)", file=sys.stderr)

    t0 = time.perf_counter()
    metrics: dict = {}
    scc = strongly_connected_components(
        g, max_iter=120, max_phases=LEVELS + 10, metrics_out=metrics)
    sizes = sorted(
        (r.scc, r.cnt)
        for r in scc.groupBy("scc").agg(F.count(F.lit(1)).alias("cnt"))
        .collect())
    timings["manyscc"] = round(time.perf_counter() - t0, 1)
    assert sizes == [(s * B, B) for s in range(K)], sizes[:5]
    extra["manyscc"] = {"edges": n_edges, "sccs": len(sizes), **metrics}
    print(f"manyscc: {len(sizes)} SCCs exact, phases={metrics['phases']}, "
          f"color_supersteps={metrics['color_supersteps']}, "
          f"trimmed={metrics['trimmed']} ({timings['manyscc']}s)",
          file=sys.stderr)


def run_pack(spark, timings, extra, n_files: int):
    """R8_RUN_PACK=<n>: the pack hop's rate story on a real n-file corpus
    (round-7 verdict item 5's Done criterion). Measures all three legs on
    the same host in one session: the per-object-bound file-backed decode
    (the r7 4.6k files/s finding), the ONE-TIME pack hop (binaryFile scan →
    parquet binary shards), and the packed re-scan decode — which must run
    at the in-stream decode-bound rate (~100x the file-backed rate), since
    that is the whole point of paying the pack once."""
    import shutil

    from pyspark.sql import functions as F

    import scale_llm
    from gmr_spark.operators.multimodal import (
        _ensure_packed_payloads,
        _ensure_payload_files,
        _make_wav_payload_batches,
        multimodal_audio_files,
        multimodal_pack,
    )

    scratch = f"/tmp/r8_pack_{n_files}"
    asf = scale_llm.build_corpus(spark, n=n_files, scratch=scratch)
    t0 = time.perf_counter()
    files_dir = _ensure_payload_files(spark, asf, "wav",
                                      _make_wav_payload_batches)
    timings["pack_write_files"] = round(time.perf_counter() - t0, 1)

    # leg A: file-backed scan+decode (per-object bound — the r7 baseline)
    t0 = time.perf_counter()
    agg_a = multimodal_audio_files(spark, asf).agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_frames").alias("frames")
    ).first()
    file_s = time.perf_counter() - t0
    timings["pack_filebacked_decode"] = round(file_s, 1)
    assert agg_a.n == n_files

    # leg B: the one-time pack hop (includes its own binaryFile pass)
    t0 = time.perf_counter()
    packed_dir = _ensure_packed_payloads(spark, asf, "wav",
                                         _make_wav_payload_batches)
    pack_s = time.perf_counter() - t0
    timings["pack_hop"] = round(pack_s, 1)

    # leg C: packed re-scan decode — every pass after the first pays this
    t0 = time.perf_counter()
    agg_c = multimodal_pack(spark, asf).agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_frames").alias("frames")
    ).first()
    packed_s = time.perf_counter() - t0
    timings["pack_packed_decode"] = round(packed_s, 1)
    assert agg_c.n == n_files and agg_c.frames == agg_a.frames

    extra["pack"] = {
        "files": n_files,
        "frames": int(agg_c.frames),
        "filebacked_files_per_sec": round(n_files / file_s),
        "pack_hop_files_per_sec": round(n_files / pack_s),
        "packed_files_per_sec": round(n_files / packed_s),
        "packed_speedup_per_pass": round(file_s / packed_s, 1),
    }
    print(f"pack: file-backed {extra['pack']['filebacked_files_per_sec']}/s, "
          f"hop {extra['pack']['pack_hop_files_per_sec']}/s, packed re-scan "
          f"{extra['pack']['packed_files_per_sec']}/s "
          f"({extra['pack']['packed_speedup_per_pass']}x per pass)",
          file=sys.stderr)
    shutil.rmtree(files_dir, ignore_errors=True)
    shutil.rmtree(packed_dir, ignore_errors=True)
    shutil.rmtree(scratch, ignore_errors=True)


def main() -> None:
    from gmr_spark.session import calibration_probe, get_session

    spark = get_session("r8_scale", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extra: dict[str, object] = {}
    calibration_probe(spark)  # warm codegen
    extra["calibration_sec"] = calibration_probe(spark)

    if os.environ.get("R8_RUN_SKEW", ""):
        run_skew(spark, timings, extra)
    if os.environ.get("R8_RUN_MANYSCC", ""):
        run_manyscc(spark, timings, extra)
    n_pack = int(os.environ.get("R8_RUN_PACK", 0) or 0)
    if n_pack:
        run_pack(spark, timings, extra, n_pack)

    extra["calibration_post_sec"] = calibration_probe(spark)
    print(json.dumps({
        "metric": "r8_scale_proof",
        "vertices": V,
        "cpus": int(CPUS),
        "timings_sec": timings,
        "unit": "sec",
        **extra,
    }))


if __name__ == "__main__":
    main()
