"""gmr_spark — a PySpark-native analytics engine with the query surface of
xiaobaidemu/GMR (reference: /root/reference, C++/MPI graph-MapReduce), rebuilt
Spark-first, plus LLM-data-pipeline operators (dedup, similarity, text).

Architecture (see SURVEY.md):
- the GMR data model (distributed property graph, partition.h:20-42) becomes a
  pair of DataFrames ``vertices(id, value, active)`` / ``edges(src, dst, weight)``;
- the MPI superstep loop (igmr.cpp:116-247) becomes a driver-side Pregel loop
  over DataFrame transforms (``gmr_spark.plans.pregel``);
- all physical machinery the reference hand-rolls (hash partitioning, all-to-all
  exchange, sorted-merge updates, sample sort) is delegated to Catalyst/AQE.
"""

from gmr_spark.session import get_session
from gmr_spark.graph import PropertyGraph

__all__ = ["get_session", "PropertyGraph"]
__version__ = "0.1.0"
