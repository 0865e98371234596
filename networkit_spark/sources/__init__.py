"""Graph sources (readers) and sinks (writers) — SURVEY.md §2.1/§2.2.

Parquet is the native format; text formats (edge list, METIS, SNAP,
KONECT) are supported for fixture parity with the reference readers."""

from networkit_spark.sources.edgelist import read_edge_list, read_snap, read_konect, write_edge_list, write_snap
from networkit_spark.sources.metis import read_metis

#: Format name → reader kwargs preset, the ``networkit.graphio.Format``
#: dispatch table (``networkit/graphio.py`` readGraph/writeGraph).  Names
#: are the reference's enum spellings, lower-cased.
_READERS = {
    "edgelist": lambda spark, path, **kw: read_edge_list(spark, path, **kw),
    "edgelisttabzero": lambda spark, path, **kw: read_edge_list(
        spark, path, separator="\t", first_node=0, **kw
    ),
    "edgelisttabone": lambda spark, path, **kw: read_edge_list(
        spark, path, separator="\t", first_node=1, **kw
    ),
    "edgelistspacezero": lambda spark, path, **kw: read_edge_list(
        spark, path, separator=r"\s+", first_node=0, **kw
    ),
    "edgelistspaceone": lambda spark, path, **kw: read_edge_list(
        spark, path, separator=r"\s+", first_node=1, **kw
    ),
    "metis": lambda spark, path, **kw: read_metis(spark, path),
    "snap": lambda spark, path, **kw: read_snap(spark, path, **kw),
    "konect": lambda spark, path, **kw: read_konect(spark, path, **kw),
    "gml": lambda spark, path, **kw: _read_gml(spark, path),
    "graphml": lambda spark, path, **kw: _read_graphml(spark, path),
    "matrixmarket": lambda spark, path, **kw: _read_formats(spark, path, "mm"),
    # Format.MAT in the reference is MATLAB binary (scipy loadmat), NOT
    # MatrixMarket — don't alias it; fail loudly instead of misparsing.
    "mat": lambda spark, path, **kw: _raise_mat(path),
    "gexf": lambda spark, path, **kw: _read_formats(spark, path, "gexf"),
    "graphtoolbinary": lambda spark, path, **kw: _read_binary(spark, path, "gt"),
    "thrillbinary": lambda spark, path, **kw: _read_binary(spark, path, "thrill"),
}


def _read_binary(spark, path, kind):
    from networkit_spark.sources import binary

    return (
        binary.read_graphtool(spark, path)
        if kind == "gt"
        else binary.read_thrill(spark, path)
    )


def _raise_mat(path):
    raise NotImplementedError(
        f"MATLAB .mat graphs are not supported ({path!r}); convert to "
        "MatrixMarket (fmt='matrixmarket') or an edge list offline"
    )


def _read_formats(spark, path, kind):
    from networkit_spark.sources import formats

    return (
        formats.read_matrix_market(spark, path)
        if kind == "mm"
        else formats.read_gexf(spark, path)
    )


def _read_gml(spark, path):
    from networkit_spark.sources.gml import read_gml

    return read_gml(spark, path)


def _read_graphml(spark, path):
    from networkit_spark.sources.gml import read_graphml

    return read_graphml(spark, path)

_EXT_TO_FORMAT = {
    ".graph": "metis",
    ".metis": "metis",
    ".edgelist": "edgelist",
    ".edges": "edgelist",
    ".txt": "snap",
    ".konect": "konect",
    ".gml": "gml",
    ".graphml": "graphml",
    ".mtx": "matrixmarket",
    ".gexf": "gexf",
    ".gt": "graphtoolbinary",
    ".thrill": "thrillbinary",
}


def read_graph(spark, path: str, fmt: str | None = None, **kw):
    """``readGraph(path, Format.X)`` dispatch (``networkit/graphio.py``):
    explicit ``fmt`` wins; otherwise the file extension picks the reader.
    Parquet edge tables short-circuit to the native ``spark.read``."""
    from networkit_spark.graph import EdgeGraph
    from pyspark.sql import functions as F  # noqa: F401  (parity import)

    if fmt is None:
        low = path.lower()
        if low.endswith(".parquet") or low.endswith(".pq"):
            return EdgeGraph.from_edges(spark.read.parquet(path))
        for ext, name in _EXT_TO_FORMAT.items():
            if low.endswith(ext):
                fmt = name
                break
        else:
            raise ValueError(f"cannot infer graph format from {path!r}; pass fmt=")
    key = fmt.lower().replace("_", "").replace("-", "")
    if key.endswith(".parquet") or key == "parquet":
        return EdgeGraph.from_edges(spark.read.parquet(path))
    if key not in _READERS:
        raise ValueError(f"unknown graph format {fmt!r} (known: {sorted(_READERS)})")
    return _READERS[key](spark, path, **kw)


def write_graph(graph, path: str, fmt: str | None = None, **kw) -> None:
    """``writeGraph`` dispatch: text formats (edge list / GML / GraphML /
    GEXF / DOT / METIS / SNAP), binary (graph-tool gt / Thrill), or
    parquet (the native sink)."""
    if fmt is None:
        low = path.lower()
        if low.endswith((".parquet", ".pq")):
            fmt = "parquet"
        elif low.endswith((".graph", ".metis")):
            fmt = "metis"
        elif low.endswith(".gt"):
            fmt = "graphtoolbinary"
        elif low.endswith(".thrill"):
            fmt = "thrillbinary"
        elif low.endswith(".gml"):
            fmt = "gml"
        elif low.endswith(".graphml"):
            fmt = "graphml"
        elif low.endswith(".gexf"):
            fmt = "gexf"
        elif low.endswith(".dot") or low.endswith(".gv"):
            fmt = "dot"
        else:
            fmt = "edgelist"
    key = fmt
    key = key.lower().replace("_", "").replace("-", "")
    if key == "parquet":
        graph.edges.write.mode("overwrite").parquet(path)
        return
    if key.startswith("edgelist"):
        sep = "\t" if ("tab" in key or key == "edgelist") else " "
        write_edge_list(graph, path, separator=sep, **kw)
        return
    if key == "gml":
        from networkit_spark.sources.gml import write_gml

        write_gml(graph, path)
        return
    if key == "graphml":
        from networkit_spark.sources.gml import write_graphml

        write_graphml(graph, path)
        return
    if key == "gexf":
        from networkit_spark.sources.formats import write_gexf

        write_gexf(graph, path)
        return
    if key == "dot":
        from networkit_spark.sources.formats import write_dot

        write_dot(graph, path)
        return
    if key == "metis":
        from networkit_spark.sources.metis import write_metis

        write_metis(graph, path, **kw)
        return
    if key == "snap":
        write_snap(graph, path)
        return
    if key == "graphtoolbinary":
        from networkit_spark.sources.binary import write_graphtool

        write_graphtool(graph, path, **kw)
        return
    if key == "thrillbinary":
        from networkit_spark.sources.binary import write_thrill

        write_thrill(graph, path)
        return
    raise ValueError(f"unknown graph sink format {fmt!r}")


__all__ = [
    "read_edge_list",
    "read_snap",
    "read_konect",
    "write_edge_list",
    "read_metis",
    "read_graph",
    "write_graph",
]
