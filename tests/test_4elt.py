"""End-to-end on the reference's real medium fixture (4elt.graph, 15,606
vertices / 91,756 directed adjacencies — graph/README.md).

Ground truth: BFS from vertex 1 reaches the whole mesh with eccentricity 69
(70 supersteps). This also documents that the reference's captured `result`
for this exact run (all distances ≤ 2 after 3 supersteps, SURVEY §5) is an
artifact of its premature-termination bug (igmr.cpp:147-149), not a golden.
"""

from __future__ import annotations

import os

import pytest

from gmr_spark.algorithms import bfs
from gmr_spark.sources.graph_file import read_graph_file

FOUR_ELT = "/root/reference/4elt.graph"


@pytest.mark.skipif(not os.path.exists(FOUR_ELT), reason="reference fixture absent")
def test_bfs_4elt_full_mesh(spark):
    g = read_graph_file(spark, FOUR_ELT)
    assert g.declared_counts == (15606, 91756)
    levels = bfs(g, source=1, max_iter=120)
    reached = levels.filter("level IS NOT NULL").count()
    assert reached == 15606  # connected mesh: everything reachable
    assert levels.agg({"level": "max"}).first()[0] == 69.0
