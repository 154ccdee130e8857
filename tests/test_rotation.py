"""Correctness-rotation invariants (round-4 verdict item 2): the driver
snapshots only the first ~DRIVER_WINDOW registry entries per round, so the
rotation order must (a) front every query whose prior row is stale and
(b) bound worst-case staleness. Round-5 verdict item 2 adds the
self-expiring round stamp and gate propagation. Pure ordering logic — no
SparkSession.
"""

from __future__ import annotations

import math

from gmr_spark.queries import (
    _CHANGED_THIS_ROUND,
    _MEASURED_BY,
    DRIVER_WINDOW,
    STEADY_CHANGED_MAX,
    _changed_names,
    _driver_row_rounds,
    _natural_registry,
    _rotation_order,
    all_oracles,
    all_queries,
)


def _current_round() -> int:
    last = _driver_row_rounds()
    return (max(last.values()) + 1) if last else 1


def test_rotation_fronts_changed_then_stalest():
    order = _rotation_order(_natural_registry())
    changed_set = _changed_names()
    changed = [n for n in order if n in changed_set]
    # every changed query precedes every unchanged one
    assert order[: len(changed)] == changed
    last = _driver_row_rounds()
    ages = [last.get(n, -1) for n in order if n not in changed_set]
    # unchanged tail is sorted oldest-row-first
    assert ages == sorted(ages)


def test_rotation_staleness_bound_holds():
    """Every query ≥2 driver rounds stale (plus never-checked ones) must fit
    in the next driver window — the concrete guarantee behind the
    ceil(N / (W - changed)) staleness bound in _rotation_order's docstring.
    If the registry ever grows past what one window can drain, this fails
    loudly instead of letting rows silently age (the round-4 finding: 13
    queries rode round-2 rows while the docstring claimed a 2-round cycle).
    """
    registry = _natural_registry()
    order = _rotation_order(registry)
    last = _driver_row_rounds()
    if not last:
        return  # fresh checkout without CORRECTNESS artifacts
    max_round = max(last.values())
    changed_set = _changed_names()
    must_refresh = {
        n for n in registry
        if n in changed_set or last.get(n, -1) <= max_round - 2
    }
    assert len(must_refresh) <= DRIVER_WINDOW, (
        f"{len(must_refresh)} stale/changed queries exceed the "
        f"{DRIVER_WINDOW}-row driver window — split the refresh across "
        "rounds deterministically")
    window = set(order[:DRIVER_WINDOW])
    missing = must_refresh - window
    assert not missing, f"stale queries outside the next window: {sorted(missing)}"
    # and the documented worst-case bound is arithmetically satisfiable at
    # the STEADY-STATE changed rate (≤ STEADY_CHANGED_MAX names per round —
    # queries.py's discipline note). A one-round spike above that (e.g. the
    # round-6 conf-gate change fronting all 20 pregel-routed queries) defers
    # at most (spike − steady) oldest refreshes by one round, and each such
    # deferral is covered by the dynamic must_refresh-fits-window assertion
    # above, which is the real invariant; the stamp's self-expiry guarantees
    # a spike cannot persist. This static check exists to catch REGISTRY
    # growth (its failure message), not spikes.
    n, w = len(registry), DRIVER_WINDOW - STEADY_CHANGED_MAX
    assert math.ceil(n / w) <= 3, (
        f"registry ({n}) outgrew the documented 3-round staleness bound")


def test_queries_and_oracles_share_order():
    q = list(all_queries())
    o = list(all_oracles())
    # oracle dict may be a subset-superset mismatch only for bench-only
    # entries; every shared key must appear in the same relative order
    shared = [n for n in q if n in set(o)]
    assert shared == [n for n in o if n in set(q)]


def test_changed_this_round_names_exist():
    registry = _natural_registry()
    unknown = [n for n in _CHANGED_THIS_ROUND["names"] if n not in registry]
    assert not unknown, f"_CHANGED_THIS_ROUND names not in registry: {unknown}"
    unknown_gates = [
        g for gates in _MEASURED_BY.values() for g in gates
        if g not in registry
    ] + [s for s in _MEASURED_BY if s not in registry]
    assert not unknown_gates, f"_MEASURED_BY names not in registry: {unknown_gates}"


def test_changed_flag_self_expires(monkeypatch):
    """A flag list stamped with a PAST round has no effect on ordering —
    the round-5 failure mode (hand-maintained list frozen at its round,
    silently re-fronting 6 queries forever) is now structurally impossible."""
    import gmr_spark.queries as Q

    current = _current_round()
    names = tuple(list(_natural_registry())[:3])
    monkeypatch.setattr(
        Q, "_CHANGED_THIS_ROUND", {"round": current - 1, "names": names})
    assert Q._changed_names() == frozenset()
    # stale stamp => pure oldest-first order
    order = Q._rotation_order(_natural_registry())
    last = _driver_row_rounds()
    ages = [last.get(n, -1) for n in order]
    assert ages == sorted(ages)
    # current stamp => those same names front the window
    monkeypatch.setattr(
        Q, "_CHANGED_THIS_ROUND", {"round": current, "names": names})
    assert Q._changed_names() >= set(names)
    order = Q._rotation_order(_natural_registry())
    assert set(order[: len(Q._changed_names())]) == set(Q._changed_names())


def test_changed_flag_propagates_to_measuring_gates(monkeypatch):
    """Flagging an operator's query flags the gates that measure it
    (round-5 gap: ann_recall_at_k rode a stale row across the ann_rh_lsh
    rewrite because only the subject was flagged)."""
    import gmr_spark.queries as Q

    monkeypatch.setattr(
        Q, "_CHANGED_THIS_ROUND",
        {"round": _current_round(), "names": ("ann_rh_lsh",)})
    got = Q._changed_names()
    assert "ann_recall_at_k" in got and "ann_rh_lsh" in got


def test_bench_headline_names_resolve():
    """Every bench HEADLINE name must resolve to a registry query, a
    bench-only query, or one of the harness's synthetic attribution rows —
    a typo here would crash the driver's bench run at the KeyError, hours
    into the round."""
    import bench

    from gmr_spark.queries import BENCH_ONLY_QUERIES

    synthetic = {"derive_graphs", "dedup_pair_chain", "multimodal_pack_build"}
    known = set(all_queries()) | set(BENCH_ONLY_QUERIES) | synthetic
    unknown = set(bench.HEADLINE) - known
    assert not unknown, f"HEADLINE names with no implementation: {unknown}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE)), "duplicate rows"


def test_bench_detail_sidecar_keyed_by_cpus():
    """r14 VERDICT item 6: the driver's auxiliary scaling runs (other core
    counts) must not clobber the committed 32-core full-run sidecar — the
    canonical run keeps BENCH_DETAIL.json, every other core count gets its
    own suffixed file."""
    import bench

    assert bench.detail_sidecar_name("32") == "BENCH_DETAIL.json"
    assert bench.detail_sidecar_name(32) == "BENCH_DETAIL.json"
    assert bench.detail_sidecar_name("8") == "BENCH_DETAIL_c8.json"
    assert bench.detail_sidecar_name(16) == "BENCH_DETAIL_c16.json"


def test_bench_bracket_flagging_rule():
    """compute_brackets (round-9 verdict item 3): every query gets the
    probe pair surrounding its segment, and exactly the queries whose pair
    disagrees >1.25x are flagged noisy — the self-adjudication rule the
    r6/r7/r9 throttling forensics applied by hand."""
    import bench

    # three segments: probes 0.2 -> 0.2 (stable), 0.2 -> 0.3 (1.5x,
    # throttle lands mid-run), 0.3 -> 0.28 (stays slow but stable)
    seg_index = {"a": 0, "b": 0, "c": 1, "d": 2}
    probes = [0.2, 0.2, 0.3, 0.28]
    brackets, noisy = bench.compute_brackets(seg_index, probes)
    assert brackets == {"a": [0.2, 0.2], "b": [0.2, 0.2],
                        "c": [0.2, 0.3], "d": [0.3, 0.28]}
    assert noisy == ["c"]
    # drift in either direction flags; a zero probe never divides
    assert bench.compute_brackets({"x": 0}, [0.3, 0.2])[1] == ["x"]
    assert bench.compute_brackets({"x": 0}, [0.0, 0.2])[1] == []


def test_bench_artifact_schema(spark, monkeypatch, capsys, tmp_path):
    """BENCH_r{N} artifact contract (round-9 verdict item 3): the sidecar
    artifact must carry per-query calibration_brackets and a noisy list so
    the judge reads host-noise adjudication OFF the artifact instead of
    re-running forensics, while the stdout line (since r14) is the minimal
    driver contract — small enough that the driver's 2,000-char tail parses
    it whole. Pinned by an in-process bench run over three cheap rows at
    sf0.001."""
    import json

    import bench

    subset = ["q6_forecast_revenue", "token_stats", "doc_fingerprints"]
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr(bench, "CAL_EVERY", 1)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ONLY", ",".join(subset))
    detail_path = tmp_path / "detail.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", str(detail_path))
    bench.main()
    out = capsys.readouterr().out
    # stdout carries EXACTLY one line: the minimal contract dict, parseable
    # from the driver's 2,000-char tail capture (r14 measurement fix)
    stdout_lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(stdout_lines) == 1
    contract = json.loads(stdout_lines[0])
    assert list(contract) == ["metric", "unit", "sf", "value", "queries"]
    assert contract["metric"] == "gmr_spark_headline_total"
    assert contract["unit"] == "sec"
    assert set(subset) == set(contract["queries"])
    assert json.loads(stdout_lines[0][-2000:]) == contract
    # full diagnostics land in the sidecar
    got = json.loads(detail_path.read_text())
    assert got["value"] == contract["value"]
    assert got["queries"] == contract["queries"]
    assert set(subset) == set(got["queries"])
    assert set(got["calibration_brackets"]) == set(got["queries"])
    for name, pair in got["calibration_brackets"].items():
        assert len(pair) == 2 and all(
            isinstance(p, float) and p > 0 for p in pair), (name, pair)
    assert isinstance(got["noisy"], list)
    assert set(got["noisy"]) <= set(got["queries"])
    assert got["calibration_sec"] > 0 and got["calibration_post_sec"] > 0
    # r11 additions: per-row drift ratios (consumers pick their own
    # threshold) and the probe estimator stamp (min-of-2 since r10 — prior
    # rounds' single-sample drift is a different statistic)
    assert got["calibration_estimator"] == "min2"
    assert got["row_estimator"] == "min2_above_floor"
    assert got["retry_floor_sec"] == 2.0
    assert set(got["bracket_drift"]) == set(got["queries"])
    assert all(r >= 1.0 for r in got["bracket_drift"].values())
    # tail-safety: value and queries are the LAST two keys of the artifact
    assert list(got)[-2:] == ["value", "queries"]


def test_bench_tail_keeps_timings():
    """Round-10 verdict item 1: the driver records only the LAST 2,000
    characters of the bench stdout line, and r10's brackets/noisy fields —
    appended after "queries" — evicted every per-query timing from
    BENCH_r10.json. Pin the fix at the full headline count with pessimistic
    field widths: the last 2,000 chars of the compact dump must contain the
    complete, parseable queries dict (and the value key)."""
    import json

    import bench

    # pessimistic inputs: every timing at the 5-char width (2 dp since r13;
    # sf0.1 rows run 0.2-40 s and EVERY row at 99.99 s would be a 7,700 s
    # bench — far past plausible),
    # every bracket noisy so the noisy list carries all names. bench.main
    # also warns at runtime if the actual suffix ever exceeds the budget.
    timings = {n: 99.99 for n in bench.HEADLINE}
    brackets = {n: [0.1, 0.9] for n in bench.HEADLINE}
    noisy = sorted(bench.HEADLINE)
    result = bench.build_result(timings, 0.1, 0.211, 0.207, brackets, noisy)
    # the stdout line is the minimal contract dict (r14): even at this
    # pessimistic width its 2,000-char tail keeps the complete queries dict
    line = bench.contract_line(result)
    assert json.loads(line) == {
        "metric": result["metric"], "unit": result["unit"],
        "sf": result["sf"], "value": result["value"],
        "queries": result["queries"]}
    assert list(json.loads(line))[-2:] == ["value", "queries"]
    tail = line[-2000:]
    start = tail.find('"queries":')
    assert start != -1, "queries key truncated out of the 2,000-char tail"
    parsed = json.loads(tail[start + len('"queries":'):].rstrip("}") + "}")
    assert set(parsed) == set(bench.HEADLINE)
    assert all(parsed[n] == 99.99 for n in bench.HEADLINE)
    assert '"value":' in tail
    # the sidecar artifact keeps the tail-safe key order too (a consumer
    # that only has the last 2,000 chars of it still sees the timings)
    full_line = json.dumps(result, separators=(",", ":"))
    assert list(result)[-2:] == ["value", "queries"]
    assert full_line[-2000:].find('"queries":') != -1
    # growth budget: at REALISTIC widths (sf0.1 rows run 0.2-40 s; the
    # current full bench line is ~1.9 KB) the whole contract line fits the
    # driver's 2,000-char tail, so its json parse succeeds. When the
    # headline grows past the budget, shrink the set or re-round — the
    # runtime warning in bench.main fires at >1990 chars.
    realistic = bench.build_result(
        {n: 9.99 for n in bench.HEADLINE}, 0.1, 0.211, 0.207, brackets,
        noisy)
    assert len(bench.contract_line(realistic)) <= 1990, \
        len(bench.contract_line(realistic))
