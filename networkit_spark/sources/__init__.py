"""Graph sources (readers) and sinks (writers) — SURVEY.md §2.1/§2.2.

Parquet is the native format; text formats (edge list, METIS, SNAP,
KONECT) are supported for fixture parity with the reference readers."""

from networkit_spark.sources.edgelist import read_edge_list, read_snap, read_konect, write_edge_list
from networkit_spark.sources.metis import read_metis

__all__ = [
    "read_edge_list",
    "read_snap",
    "read_konect",
    "write_edge_list",
    "read_metis",
]
