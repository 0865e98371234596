"""Binary graph formats: graph-tool ``gt`` and Thrill adjacency blobs.

Reference: ``cpp/io/GraphToolBinaryReader.cpp`` / ``GraphToolBinaryWriter.cpp``
and ``cpp/io/ThrillGraphBinaryReader.cpp`` / ``ThrillGraphBinaryWriter.cpp``.

Both are sequential variable-length single-stream encodings (a node's
record offset depends on every earlier degree), so they cannot be split
for distributed scan — like the reference, IO is driver-side; adjacency
is ASSEMBLED distributed (one groupBy) and only the per-node neighbor
lists are collected.  Parquet remains the native at-scale format.

gt layout (``GraphToolBinaryReader::checkHeader/readComment``):
magic ``e2 9b be 20 67 74`` + version 0x01 + endian byte, uint64
comment length + comment, directed byte, uint64 n, then per node
u = 0..n−1: uint64 degree + degree node ids of width 1/2/4/8 bytes
(smallest unsigned type holding n).  Undirected graphs store each edge
once at the HIGHER endpoint (writer keeps ``v <= u``).

Thrill layout (``ThrillGraphBinaryReader::get_variant/get_uint32``):
per node u = 0..n−1: varint7 degree + degree uint32-LE neighbor ids,
forward adjacency ``u <= v`` — undirected, ≤ 2³²−1 nodes.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from networkit_spark.graph import EdgeGraph, canonicalize

_GT_MAGIC = bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74])


def _gt_width(n: int) -> int:
    if n < 1 << 8:
        return 1
    if n < 1 << 16:
        return 2
    if n < 1 << 32:
        return 4
    return 8


def _collect_adjacency(graph: EdgeGraph, keep) -> tuple[list[int], dict[int, list[int]]]:
    """ids (ascending) + per-node neighbor lists filtered by ``keep``
    ('le' → v ≤ u for undirected dedup, 'all' → every out-neighbor)."""
    ids = [int(r["id"]) for r in graph.vertices().orderBy("id").collect()]
    adj_df = graph.sym() if not graph.directed else graph.edges
    if keep == "le":
        adj_df = adj_df.where(F.col("dst") <= F.col("src"))
    elif keep == "ge":
        adj_df = adj_df.where(F.col("dst") >= F.col("src"))
    rows = (
        adj_df.groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .collect()
    )
    return ids, {int(r["src"]): [int(v) for v in r["nbrs"]] for r in rows}


def write_graphtool(graph: EdgeGraph, path: str, little_endian: bool = True) -> None:
    """``GraphToolBinaryWriter`` — node ids are compacted to 0..n−1 in
    ascending order when not already continuous (the reference's
    ``getContinuousNodeIds``)."""
    keep = "le" if not graph.directed else "all"
    ids, adj = _collect_adjacency(graph, keep)
    n = len(ids)
    remap = {v: i for i, v in enumerate(ids)}
    width = _gt_width(n)
    bo = "<" if little_endian else ">"
    wfmt = {1: "B", 2: "H", 4: "I", 8: "Q"}[width]
    with open(path, "wb") as fh:
        fh.write(_GT_MAGIC + bytes([0x01, 0x00 if little_endian else 0x01]))
        fh.write(struct.pack(bo + "Q", 0))  # empty comment
        fh.write(bytes([1 if graph.directed else 0]))
        fh.write(struct.pack(bo + "Q", n))
        for u in ids:
            nbrs = [remap[v] for v in adj.get(u, [])]
            fh.write(struct.pack(bo + "Q", len(nbrs)))
            if nbrs:
                fh.write(struct.pack(f"{bo}{len(nbrs)}{wfmt}", *nbrs))


def read_graphtool(spark: SparkSession, path: str) -> EdgeGraph:
    """``GraphToolBinaryReader`` — undirected edges were stored at the
    higher endpoint; canonicalized back to src ≤ dst."""
    with open(path, "rb") as fh:
        blob = fh.read()
    if blob[:6] != _GT_MAGIC or blob[6] != 0x01 or blob[7] not in (0, 1):
        raise ValueError("File header is broken")
    bo = "<" if blob[7] == 0 else ">"
    off = 8
    (clen,) = struct.unpack_from(bo + "Q", blob, off)
    off += 8 + clen
    directed = blob[off] == 1
    off += 1
    (n,) = struct.unpack_from(bo + "Q", blob, off)
    off += 8
    width = _gt_width(n)
    dt = np.dtype({1: "u1", 2: "u2", 4: "u4", 8: "u8"}[width]).newbyteorder(bo)
    srcs: list[np.ndarray] = []
    dsts: list[np.ndarray] = []
    for u in range(n):
        (deg,) = struct.unpack_from(bo + "Q", blob, off)
        off += 8
        if deg:
            nbrs = np.frombuffer(blob, dtype=dt, count=deg, offset=off).astype(np.int64)
            off += deg * width
            srcs.append(np.full(deg, u, dtype=np.int64))
            dsts.append(nbrs)
    if srcs:
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        e = spark.createDataFrame(
            [(int(a), int(b), 1.0) for a, b in zip(src, dst)],
            "src long, dst long, weight double",
        )
    else:
        e = spark.createDataFrame([], "src long, dst long, weight double")
    if not directed:
        e = canonicalize(e, weighted_dedup="first")
    return EdgeGraph(e, directed=directed, weighted=False)


def _varint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        out.append(b | (0x80 if x else 0))
        if not x:
            return bytes(out)


def write_thrill(graph: EdgeGraph, path: str) -> None:
    """``ThrillGraphBinaryWriter`` — undirected forward adjacency
    (u ≤ v), uint32 node ids; node ids must be dense 0..n−1 (the
    reference indexes by position)."""
    if graph.directed:
        raise ValueError("Thrill binary graphs are undirected")
    ids, adj = _collect_adjacency(graph, "ge")
    n = len(ids)
    if n and (ids[0] != 0 or ids[-1] != n - 1):
        raise ValueError("Thrill binary graphs need dense node ids 0..n-1")
    if n > (1 << 32) - 1:
        raise ValueError("Thrill binary graphs only support up to 2^32-1 nodes")
    with open(path, "wb") as fh:
        for u in range(n):
            nbrs = adj.get(u, [])
            fh.write(_varint(len(nbrs)))
            if nbrs:
                fh.write(np.asarray(nbrs, dtype="<u4").tobytes())


def read_thrill(spark: SparkSession, path: str) -> EdgeGraph:
    """``ThrillGraphBinaryReader`` — varint degrees + uint32-LE forward
    neighbor lists."""
    with open(path, "rb") as fh:
        blob = fh.read()
    off, u = 0, 0
    srcs: list[np.ndarray] = []
    dsts: list[np.ndarray] = []
    while off < len(blob):
        deg, shift = 0, 0
        while True:
            b = blob[off]
            off += 1
            deg |= (b & 0x7F) << shift
            shift += 7
            if not (b & 0x80):
                break
            if shift >= 64:
                raise OverflowError("Overflow during variant64 decoding.")
        if deg:
            nbrs = np.frombuffer(blob, dtype="<u4", count=deg, offset=off).astype(np.int64)
            off += 4 * deg
            srcs.append(np.full(deg, u, dtype=np.int64))
            dsts.append(nbrs)
        u += 1
    if srcs:
        e = spark.createDataFrame(
            [(int(a), int(b), 1.0) for a, b in zip(np.concatenate(srcs), np.concatenate(dsts))],
            "src long, dst long, weight double",
        )
    else:
        e = spark.createDataFrame([], "src long, dst long, weight double")
    return EdgeGraph(canonicalize(e, weighted_dedup="first"), directed=False, weighted=False)
