"""MatrixMarket / DOT / GEXF formats — fixture-format parity.

Reference: ``cpp/io/MatrixMarketReader.cpp`` (coordinate matrices →
adjacency), ``cpp/io/DotGraphWriter.cpp`` (Graphviz sink), and
``networkit/GEXFIO.py`` (Gephi exchange XML, static mode).

MatrixMarket bodies are line-oriented ``i j [value]`` triplets, so the
ENTRIES section parses DISTRIBUTED via ``spark.read.text`` — only the
banner/size header (first two non-comment lines) is read driver-side.
DOT/GEXF are small-fixture interchange formats; like the GML/GraphML
pair (see ``gml.py``) they parse/serialize driver-side by design, the
same stance as the reference's single-threaded scanners.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from networkit_spark.graph import EdgeGraph


def read_matrix_market(spark, path: str) -> EdgeGraph:
    """``MatrixMarketReader`` (``cpp/io/MatrixMarketReader.cpp:40-120``):
    banner ``%%MatrixMarket matrix coordinate <real|integer|pattern>
    <general|symmetric>``; 1-based ``i j [value]`` entries.  ``pattern``
    → weight 1.0; ``symmetric`` → undirected graph (the reference
    mirrors the triplet), ``general`` → directed.  Entry parsing is
    distributed; only the banner + size line are read on the driver."""
    with open(path) as f:
        banner = f.readline().strip().lower()
        if not banner.startswith("%%matrixmarket"):
            raise ValueError(f"not a MatrixMarket file: {path!r}")
        parts = banner.split()
        fmt = parts[2] if len(parts) > 2 else "coordinate"
        data = parts[3] if len(parts) > 3 else "real"
        qualifier = parts[4] if len(parts) > 4 else "general"
        if fmt != "coordinate":
            raise ValueError("only coordinate (sparse) MatrixMarket is supported")
        # size line = first non-comment line after the banner
        size_toks: list[str] = []
        for line in f:
            s = line.strip()
            if s and not s.startswith("%"):
                size_toks = s.split()[:3]
                nrows, ncols = int(size_toks[0]), int(size_toks[1])
                break
        else:
            raise ValueError("MatrixMarket size line missing")
    if nrows != ncols:
        raise ValueError("adjacency MatrixMarket must be square")

    lines = (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("s"))
        .where((F.length("s") > 0) & ~F.col("s").startswith("%"))
    )
    # Drop the size line by CONTENT, not position: file-split ordering is
    # not offset-ordered for multi-block files, so min(monotonic id) may
    # not be the first line in file order.  The size-line text is known
    # from the driver-side header read; if an entry row happens to carry
    # the identical text, keep count-1 copies (identical text ⇒ identical
    # parsed entry, so which copy survives is immaterial).
    toks_all = lines.select(F.split("s", r"\s+").alias("t"))
    is_size = F.array_join("t", " ") == " ".join(size_toks)
    matches = toks_all.where(is_size)
    k = matches.count()
    toks = toks_all.where(~is_size)
    if k > 1:
        toks = toks.unionByName(matches.limit(k - 1))
    e = toks.select(
        (F.element_at("t", 1).cast("long") - 1).alias("src"),
        (F.element_at("t", 2).cast("long") - 1).alias("dst"),
        (
            F.element_at("t", 3).cast("double")
            if data != "pattern"
            else F.lit(None).cast("double")
        ).alias("w"),
    ).select("src", "dst", F.coalesce("w", F.lit(1.0)).alias("weight"))
    g = EdgeGraph.from_edges(e, directed=(qualifier != "symmetric"))
    g.declared_nodes = nrows
    return g


def write_dot(graph: EdgeGraph, path: str) -> None:
    """``DotGraphWriter`` (``cpp/io/DotGraphWriter.cpp:12-20``): the
    reference emits ``graph {\\n<u> -- <v>;\\n}``; directed graphs get
    the Graphviz ``digraph``/``->`` spelling."""
    edges = graph.edges.orderBy("src", "dst").collect()
    kw, arrow = ("digraph", "->") if graph.directed else ("graph", "--")
    with open(path, "w") as f:
        f.write(kw + " {\n")
        for r in edges:
            f.write(f"{r['src']} {arrow} {r['dst']};\n")
        f.write("}\n")


def write_dot_partition(graph: EdgeGraph, labels, path: str) -> None:
    """``DotPartitionWriter`` (``cpp/io/DotPartitionWriter.cpp``): DOT
    graph with nodes colored by cluster id.  ``labels``: (node, label)."""
    lab = {r["node"]: r["label"] for r in labels.collect()}
    edges = graph.edges.orderBy("src", "dst").collect()
    palette = sorted(set(lab.values()))
    color = {c: i / max(len(palette), 1) for i, c in enumerate(palette)}
    with open(path, "w") as f:
        f.write("graph {\n")
        f.write("node [shape=circle style=filled]\n")
        for n in sorted(lab):
            f.write(f'{n} [color="{color[lab[n]]:.4f},0.99,0.99"];\n')
        for r in edges:
            f.write(f"{r['src']} -- {r['dst']};\n")
        f.write("}\n")


def read_gexf(spark, path: str) -> EdgeGraph:
    """``GEXFReader`` (``networkit/GEXFIO.py``), static mode: node ids
    may be arbitrary strings → densified in document order (the
    reference keeps the same first-appearance mapping); edge ``weight``
    attribute honored; ``defaultedgetype="directed"`` honored.  Dynamic
    (``mode="dynamic"`` event-stream) GEXF is out of scope — the DGS
    reader (``dgs.py``) is the event-stream interop path."""
    root = ET.parse(path).getroot()

    def local(el):
        return el.tag.rsplit("}", 1)[-1]

    def findall(tag):
        return [el for el in root.iter() if local(el) == tag]

    graphs = findall("graph")
    directed = any(g.get("defaultedgetype") == "directed" for g in graphs)
    if any(g.get("mode") == "dynamic" for g in graphs):
        raise ValueError("dynamic GEXF unsupported; use the DGS event stream")
    node_ids = [n.get("id") for n in findall("node")]
    idmap = {s: i for i, s in enumerate(node_ids)}
    edges = []
    for e in findall("edge"):
        u, v = idmap[e.get("source")], idmap[e.get("target")]
        edges.append((u, v, float(e.get("weight") or 1.0)))
    df = spark.createDataFrame(edges or [], "src long, dst long, weight double")
    g = EdgeGraph.from_edges(df, directed=directed)
    g.declared_nodes = len(node_ids)
    return g


def write_gexf(graph: EdgeGraph, path: str) -> None:
    """``GEXFWriter`` (``networkit/GEXFIO.py``), static mode."""
    nodes = sorted(r["id"] for r in graph.vertices().collect())
    edges = graph.edges.orderBy("src", "dst").collect()
    etype = "directed" if graph.directed else "undirected"
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">\n')
        f.write(f'  <graph defaultedgetype="{etype}" mode="static">\n')
        f.write("    <nodes>\n")
        for n in nodes:
            f.write(f'      <node id="{n}" label="{n}"/>\n')
        f.write("    </nodes>\n    <edges>\n")
        for i, r in enumerate(edges):
            f.write(
                f'      <edge id="{i}" source="{r["src"]}" target="{r["dst"]}"'
                f' weight="{r["weight"]}"/>\n'
            )
        f.write("    </edges>\n  </graph>\n</gexf>\n")
