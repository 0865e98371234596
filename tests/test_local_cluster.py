"""Cluster-placement integration test for the blob store.

Runs the blob engine's DISTRIBUTED paths (fused_local=False) on a
``local-cluster[2,1,2048]`` pseudo-cluster — two separate single-core
executor JVMs with the real scheduler/serializer/shuffle paths, the
closest single-box analog of the N-executor deployment — and asserts
the results equal the in-process ``local[4]`` engine bit-for-bit.
Covers the 100-TB deployment contract: ``prepare(blob_dir=...)`` under
an explicit blob root, executors ≠ driver reading the CSR blobs +
checkpoint parquet (the vectorized-reader batch clamp), and all three
kernels (PageRank / components / PLP) off ONE store.

Spawned as a subprocess because one process can hold only one
SparkContext (the session fixture owns local[4]).  Slow (~90 s JVM
spin-up); set ``NK_SKIP_LOCAL_CLUSTER=1`` to skip.
"""

import json
import os
import subprocess
import sys

import pytest

from networkit_spark.graph import EdgeGraph
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER_SRC = r"""
import json, os, sys
sys.path.insert(0, os.environ["NK_REPO"])
from networkit_spark.session import get_spark
from networkit_spark.graph import EdgeGraph
from networkit_spark.linkgraph.blobstep import PageRankBlobEngine
from pyspark.sql import functions as F

spark = get_spark(
    master="local-cluster[2,1,2048]", shuffle_partitions=4,
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
e = spark.range(4000).select(
    (F.col("id") % 97).alias("src"),
    ((F.col("id") * 31) % 101 + 97).alias("dst"),
    F.lit(1.0).alias("weight"),
)
g = EdgeGraph.from_edges(e)
bd = os.path.join(os.environ["NK_BLOB_ROOT"], "store")
eng = PageRankBlobEngine(g, num_parts=4, blob_dir=bd)
pr = sorted((int(r["node"]), round(float(r["rank"]), 12))
            for r in eng.run(tol=0.0, max_iter=8, fused_local=False).collect())
cc = sorted(map(tuple, eng.run_components(fused_local=False).collect()))
lp = sorted(map(tuple, eng.run_plp(max_iter=3, fused_local=False).collect()))
print("RESULT " + json.dumps({"pr": pr, "cc": cc, "lp": lp}))
spark.stop()
"""


@pytest.mark.skipif(
    os.environ.get("NK_SKIP_LOCAL_CLUSTER") == "1",
    reason="local-cluster integration skipped by env",
)
def test_blob_store_on_local_cluster(spark, tmp_path):
    env = dict(os.environ)
    env["NK_REPO"] = REPO
    env["NK_BLOB_ROOT"] = str(tmp_path)
    out = subprocess.run(
        [sys.executable, "-c", DRIVER_SRC],
        capture_output=True, text=True, env=env, timeout=420,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    assert lines, f"no RESULT line; stderr tail: {out.stderr[-2000:]}"
    got = json.loads(lines[-1][len("RESULT "):])

    # same graph + kernels on the in-process local[4] session
    from networkit_spark.linkgraph.blobstep import PageRankBlobEngine

    e = spark.range(4000).select(
        (F.col("id") % 97).alias("src"),
        ((F.col("id") * 31) % 101 + 97).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    g = EdgeGraph.from_edges(e)
    eng = PageRankBlobEngine(g, num_parts=4)
    want_pr = sorted(
        (int(r["node"]), round(float(r["rank"]), 12))
        for r in eng.run(tol=0.0, max_iter=8).collect()
    )
    want_cc = sorted(map(tuple, eng.run_components().collect()))
    want_lp = sorted(map(tuple, eng.run_plp(max_iter=3).collect()))
    eng.close()

    assert [tuple(x) for x in got["pr"]] == want_pr
    assert [tuple(x) for x in got["cc"]] == want_cc
    assert [tuple(x) for x in got["lp"]] == want_lp
