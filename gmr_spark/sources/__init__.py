from gmr_spark.sources.graph_file import read_graph_file
from gmr_spark.sources.tables import load_tables, register_views
from gmr_spark.sources.derive import derive_graph, GRAPH_SQL

__all__ = ["read_graph_file", "load_tables", "register_views", "derive_graph", "GRAPH_SQL"]
