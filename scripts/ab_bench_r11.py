#!/usr/bin/env python
"""Round-11 bench anchor: interleaved A/B of the most expensive headline
queries, HEAD vs the last clean full-bench commit (r8, b097a6e).

VERDICT r10 item 2: the last uncontaminated full-bench artifact is r8
(r9 was throttle-contaminated, r10's tail lost the timings). The primary
plan is a bracket-gated full `bench.py` run (accept iff >=90% of rows
have bracket drift <=1.25x); when the host never quiets, THIS harness is
the fallback — the `scripts/ab_scc_r10.py` method (which settled the r9
SCC scare at 1.005x) widened to the 10 most expensive rows:

    derive_graphs (the shared graph materialization, billed separately),
    mst_nation_mesh, pagerank_big, pagerank_hub, ktruss_hub_tri, cc_cs,
    kmeans_embeddings, scc_nation_ring, svdpp_ratings, sssp_cs,
    triangles_ring

(every name exists in BOTH trees — r9-r11 additions like ann_ivf_pq
cannot A/B against r8 and are excluded by construction). Legs alternate
A B A B ... so host drift hits both symmetrically; each leg is a fresh
subprocess `bench.py` restricted via SPARK_GRAFT_BENCH_ONLY with its
calibration pair recorded. Read the per-query MEDIAN ratio; the per-leg
calibrations say how hard the host was drifting around it.

Usage:  python scripts/ab_bench_r11.py [n_rounds]   (default 3)
        AB_BASE_REF=b097a6e AB_SF_DIR=/root/testdata/sf0.1
        AB_SUBSET=derive_graphs,mst_nation_mesh,...
Writes one JSON line with per-leg samples + calibrations.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_REF = os.environ.get("AB_BASE_REF", "b097a6e")
SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
SUBSET = os.environ.get("AB_SUBSET", ",".join((
    "derive_graphs",
    "mst_nation_mesh",
    "pagerank_big",
    "pagerank_hub",
    "ktruss_hub_tri",
    "cc_cs",
    "kmeans_embeddings",
    "scc_nation_ring",
    "svdpp_ratings",
    "sssp_cs",
    "triangles_ring",
)))
WORKTREE = os.environ.get("AB_WORKTREE", "/tmp/ab_bench_r8_tree")


def ensure_worktree() -> str:
    want = subprocess.run(["git", "rev-parse", BASE_REF], cwd=REPO,
                          capture_output=True, text=True,
                          check=True).stdout.strip()
    if os.path.exists(os.path.join(WORKTREE, "bench.py")):
        have = subprocess.run(["git", "rev-parse", "HEAD"], cwd=WORKTREE,
                              capture_output=True, text=True,
                              check=True).stdout.strip()
        if have == want:
            return WORKTREE
        subprocess.run(["git", "worktree", "remove", "--force", WORKTREE],
                       cwd=REPO, check=True)
    subprocess.run(
        ["git", "worktree", "add", "--detach", WORKTREE, BASE_REF],
        cwd=REPO, check=True)
    return WORKTREE


def run_leg(tree: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_BENCH_ONLY=SUBSET,
               SPARK_GRAFT_SF_DIR=SF_DIR,
               # ESTIMATOR SYMMETRY: r11 lowered HEAD's per-row min-of-2
               # floor to 2 s, but the r8 tree hardcodes 15 s (it predates
               # the env knob) — running HEAD at 2 s would bias the A/B in
               # head's favor. Pin both legs to the r8 statistic.
               SPARK_GRAFT_BENCH_RETRY_FLOOR="15.0")
    # subset runs never write the BENCH_DETAIL sidecar (bench.py guards
    # on SPARK_GRAFT_BENCH_ONLY), so legs cannot clobber a full-run artifact
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=tree, env=env,
        capture_output=True, text=True, check=True)
    # since r14 stdout carries only the minimal contract line; the full
    # artifact (with the calibration pair) moved to stderr — accept either
    full, minimal = None, None
    for ln in out.stdout.splitlines() + out.stderr.splitlines():
        if not ln.startswith("{"):
            continue
        try:
            d = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if "queries" in d:
            if "calibration_sec" in d:
                full = d
            else:
                minimal = d
    d = full or minimal
    return {"queries": d["queries"],
            "cal": [d.get("calibration_sec"), d.get("calibration_post_sec")]}


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    old = ensure_worktree()
    legs: dict[str, list[dict]] = {"head": [], "r8": []}
    for i in range(n_rounds):
        for name, tree in (("head", REPO), ("r8", old)):
            leg = run_leg(tree)
            legs[name].append(leg)
            print(f"  round {i} {name}: "
                  f"{ {k: round(v, 2) for k, v in leg['queries'].items()} } "
                  f"cal={leg['cal']}", file=sys.stderr)

    summary: dict[str, dict] = {}
    for q in SUBSET.split(","):
        a = [leg["queries"][q] for leg in legs["head"]]
        b = [leg["queries"][q] for leg in legs["r8"]]
        summary[q] = {
            "head_samples": a,
            "r8_samples": b,
            "head_median": round(statistics.median(a), 3),
            "r8_median": round(statistics.median(b), 3),
            "ratio_head_over_r8": round(
                statistics.median(a) / statistics.median(b), 3),
        }
    print(json.dumps({
        "metric": "ab_bench_r11",
        "base_ref": BASE_REF,
        "sf_dir": SF_DIR,
        "n_rounds": n_rounds,
        "calibrations": {k: [leg["cal"] for leg in v]
                         for k, v in legs.items()},
        "summary": summary,
    }))


if __name__ == "__main__":
    main()
