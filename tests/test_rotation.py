"""Correctness-rotation invariants (round-4 verdict item 2): the driver
snapshots only the first ~DRIVER_WINDOW registry entries per round, so the
rotation order must (a) front every query whose prior row is stale and
(b) bound worst-case staleness. Pure ordering logic — no SparkSession.
"""

from __future__ import annotations

import math

from gmr_spark.queries import (
    _CHANGED_THIS_ROUND,
    DRIVER_WINDOW,
    _driver_row_rounds,
    _natural_registry,
    _rotation_order,
    all_oracles,
    all_queries,
)


def test_rotation_fronts_changed_then_stalest():
    order = _rotation_order(_natural_registry())
    changed = [n for n in order if n in _CHANGED_THIS_ROUND]
    # every changed query precedes every unchanged one
    assert order[: len(changed)] == changed
    last = _driver_row_rounds()
    ages = [last.get(n, -1) for n in order if n not in _CHANGED_THIS_ROUND]
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
    must_refresh = {
        n for n in registry
        if n in _CHANGED_THIS_ROUND or last.get(n, -1) <= max_round - 2
    }
    assert len(must_refresh) <= DRIVER_WINDOW, (
        f"{len(must_refresh)} stale/changed queries exceed the "
        f"{DRIVER_WINDOW}-row driver window — split the refresh across "
        "rounds deterministically")
    window = set(order[:DRIVER_WINDOW])
    missing = must_refresh - window
    assert not missing, f"stale queries outside the next window: {sorted(missing)}"
    # and the documented worst-case bound is arithmetically satisfiable
    n, w = len(registry), DRIVER_WINDOW - len(_CHANGED_THIS_ROUND)
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
    unknown = [n for n in _CHANGED_THIS_ROUND if n not in registry]
    assert not unknown, f"_CHANGED_THIS_ROUND names not in registry: {unknown}"
