"""spark-submit smoke job: build a graph from testdata parquet, run the
four north-rule kernels, print one JSON line.  The package arrives via
--py-files (no repo checkout on the executors)."""

import json

from pyspark.sql import SparkSession, functions as F

from networkit_spark.linkgraph.extract import tpch_link_graph
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.operators.components import connected_components, num_components
from networkit_spark.operators.plp import plp
from networkit_spark.operators.triangles import total_triangles


def main():
    spark = (
        SparkSession.builder.appName("networkit-spark-submit-smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    g = tpch_link_graph(spark, "/root/testdata/sf0.001")
    pr = pagerank(g, tol=1e-6, impl="blob")
    top = pr.orderBy(F.desc("rank")).first()
    out = {
        "nodes": g.num_nodes(),
        "edges": g.num_edges(),
        "top_rank_node": top["node"],
        "top_rank": round(top["rank"], 6),
        "components": num_components(connected_components(g, impl="sql")),
        "plp_communities": plp(g, max_iter=3, impl="sql").select("label").distinct().count(),
        "triangles": total_triangles(g),
    }
    print("SMOKE_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
