#!/usr/bin/env python
"""Round-10 adjudication of the r9 `scc_nation_ring` bench regression
(5.53 s -> 9.57 s, 1.73x — VERDICT r9 item 1).

The r9 artifact is contaminated (calibration drifted 0.209 -> 0.302 s
mid-run) and most regressions track the throttle band (~1.35x), but SCC
sits ABOVE it and its clean path DID change in r9 (the peel loop now
passes ``edges_checkpointed=True`` so run_pregel neither copies nor
releases the caller's edge snapshot — pregel.py:347, scc.py:124). This
script settles code-vs-host with an interleaved A/B: the committed tree
vs a worktree at the r8 commit (b097a6e), alternating A B A B ... so any
host-speed drift hits both legs symmetrically, each leg a fresh
subprocess `bench.py` run restricted to

    derive_graphs (the shared graph materialization, billed separately),
    scc_nation_ring (the subject),
    pagerank_hub + q1_pricing_summary (untouched controls),

with the per-run calibration pre/post pair recorded. Decision rule: if
the A/B median ratio on scc_nation_ring is >1.25x while the controls
stay ~1.0x under matched calibrations, the regression is real code cost
(suspect: the synchronous per-phase block release) — else it's the
throttle, closed with the controls' evidence.

Usage:  python scripts/ab_scc_r10.py [n_rounds]   (default 3)
        AB_BASE_REF=b097a6e AB_SF_DIR=/root/testdata/sf0.1
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
SUBSET = "derive_graphs,scc_nation_ring,pagerank_hub,q1_pricing_summary"
WORKTREE = os.environ.get("AB_WORKTREE", "/tmp/ab_scc_r8_tree")


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
        # stale tree from an earlier run with a different AB_BASE_REF —
        # reusing it would silently A/B against the wrong baseline while
        # labeling the artifact with the requested ref
        subprocess.run(["git", "worktree", "remove", "--force", WORKTREE],
                       cwd=REPO, check=True)
    subprocess.run(
        ["git", "worktree", "add", "--detach", WORKTREE, BASE_REF],
        cwd=REPO, check=True)
    return WORKTREE


def run_leg(tree: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_BENCH_ONLY=SUBSET,
               SPARK_GRAFT_SF_DIR=SF_DIR)
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=tree, env=env,
        capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    d = json.loads(line)
    return {"queries": d["queries"],
            "cal": [d["calibration_sec"], d["calibration_post_sec"]]}


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
        "metric": "ab_scc_r10",
        "base_ref": BASE_REF,
        "sf_dir": SF_DIR,
        "n_rounds": n_rounds,
        "calibrations": {k: [leg["cal"] for leg in v]
                         for k, v in legs.items()},
        "summary": summary,
    }))


if __name__ == "__main__":
    main()
