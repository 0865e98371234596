"""GML and GraphML readers/writers — fixture-format parity.

Reference: ``cpp/io/GMLGraphReader.cpp`` / ``GMLGraphWriter.cpp`` and
``cpp/io/GraphMLReader.cpp`` (SAX) / ``GraphMLWriter.cpp``.  Both are
nested-block single-file TEXT formats used for small fixtures and tool
interchange — inherently one stream, so the parse is driver-side and
the result materializes as a distributed edge DataFrame (same stance as
the reference: its readers are single-threaded file scans).  Bulk data
belongs in parquet (the native format).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from networkit_spark.graph import EdgeGraph


def read_gml(spark, path: str) -> EdgeGraph:
    """``GMLGraphReader`` (``cpp/io/GMLGraphReader.cpp:20-120``): parse
    ``graph [ directed 0|1, node [ id k ], edge [ source u target v
    (weight w) ] ]``.  Unknown attributes are skipped like the
    reference's key/value scanner."""
    text = open(path).read()
    directed = bool(re.search(r"\bdirected\s+1\b", text))
    nodes = [int(m) for m in re.findall(r"node\s*\[\s*[^]]*?\bid\s+(\d+)", text)]
    edges = []
    for m in re.finditer(
        r"edge\s*\[\s*([^]]*?)\]", text, flags=re.S
    ):
        body = m.group(1)
        src = re.search(r"\bsource\s+(\d+)", body)
        dst = re.search(r"\btarget\s+(\d+)", body)
        w = re.search(r"\bweight\s+([0-9.eE+-]+)", body)
        if src and dst:
            edges.append(
                (int(src.group(1)), int(dst.group(1)), float(w.group(1)) if w else 1.0)
            )
    e = spark.createDataFrame(edges or [], "src long, dst long, weight double")
    g = EdgeGraph.from_edges(e, directed=directed)
    # GML declares nodes explicitly, so isolated nodes are part of the
    # graph (the reference's GMLGraphReader adds every ``node [ id k ]``
    # block) — seed the vertex view with the declared set so
    # vertices()/num_nodes() include them (caught by the jazz2 interop
    # fixture, whose nodes 3 and 4 have no edges)
    g.declared_nodes = len(nodes)
    if nodes:
        declared = spark.createDataFrame(
            [(int(i),) for i in sorted(set(nodes))], "id long"
        )
        from networkit_spark.graph import vertices_of

        g._cache["vertices"] = (
            declared.unionByName(vertices_of(g.edges)).distinct()
        )
    return g


def write_gml(graph: EdgeGraph, path: str) -> None:
    """``GMLGraphWriter`` (``cpp/io/GMLGraphWriter.cpp:15-40``)."""
    nodes = sorted(r["id"] for r in graph.vertices().collect())
    edges = graph.edges.orderBy("src", "dst").collect()
    with open(path, "w") as f:
        f.write("graph [\n")
        if graph.directed:
            f.write("  directed 1\n")
        for n in nodes:
            f.write(f"  node [\n    id {n}\n  ]\n")
        for r in edges:
            f.write(
                f"  edge [\n    source {r['src']}\n    target {r['dst']}\n"
                f"    weight {r['weight']}\n  ]\n"
            )
        f.write("]\n")


def read_graphml(spark, path: str) -> EdgeGraph:
    """``GraphMLReader`` (``cpp/io/GraphMLReader.cpp``): XML nodes and
    edges; node ids may be arbitrary strings — mapped to dense longs in
    document order, like the reference's node map.  The first
    double-typed edge key is treated as the weight attribute."""
    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    root = ET.parse(path).getroot()

    def findall(tag):
        return root.findall(f".//g:{tag}", ns) or root.findall(f".//{tag}")

    weight_keys = {
        k.get("id")
        for k in findall("key")
        if k.get("for") == "edge" and k.get("attr.type") in ("double", "float")
    }
    node_ids = [n.get("id") for n in findall("node")]
    idmap = {s: i for i, s in enumerate(node_ids)}
    directed = any(
        g.get("edgedefault") == "directed" for g in findall("graph")
    )
    edges = []
    for e in findall("edge"):
        u, v = idmap[e.get("source")], idmap[e.get("target")]
        w = 1.0
        for d in list(e):
            if d.get("key") in weight_keys:
                w = float(d.text)
        edges.append((u, v, w))
    df = spark.createDataFrame(edges or [], "src long, dst long, weight double")
    g = EdgeGraph.from_edges(df, directed=directed)
    g.declared_nodes = len(node_ids)
    return g


def write_graphml(graph: EdgeGraph, path: str) -> None:
    """``GraphMLWriter`` (``cpp/io/GraphMLWriter.cpp``)."""
    nodes = sorted(r["id"] for r in graph.vertices().collect())
    edges = graph.edges.orderBy("src", "dst").collect()
    default = "directed" if graph.directed else "undirected"
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n')
        f.write('  <key id="w" for="edge" attr.name="weight" attr.type="double"/>\n')
        f.write(f'  <graph id="G" edgedefault="{default}">\n')
        for n in nodes:
            f.write(f'    <node id="n{n}"/>\n')
        for r in edges:
            f.write(
                f'    <edge source="n{r["src"]}" target="n{r["dst"]}">'
                f'<data key="w">{r["weight"]}</data></edge>\n'
            )
        f.write("  </graph>\n</graphml>\n")
