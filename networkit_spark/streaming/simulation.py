"""EpidemicSimulationSEIR — stateful superstep simulation over a graph.

Reference: ``cpp/simulation/EpidemicSimulationSEIR.cpp:16-103``.  States
S/E/I/R with a per-node transition timestamp: an Infectious node
contacts each neighbor every step (a Susceptible contact becomes
Exposed with probability ``trans_p`` PER CONTACT), Exposed becomes
Infectious after ``e_time`` steps, Infectious becomes Removed after
``i_time`` steps; per-step population census is the output.

Spark shape: the state table (node, state, ts) is the resumable
superstep state — one gather from infectious senders per step (the same
active-set shape as the Dyn* frontiers: only I-nodes send), Bernoulli
draws are ``xxhash64(seed, t, src, dst)`` so the run is deterministic at
any parallelism.  Documented deviation: the reference mutates the state
array in-place during one parallel sweep (its E→I promotion can expose
neighbors in the SAME step depending on thread order); this engine's
sweep is SYNCHRONOUS — contacts come from nodes infectious at step
start, all transitions apply simultaneously — which is the only
well-defined parallel semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import EdgeGraph

S, E, I, R = 0, 1, 2, 3


def epidemic_simulation_seir(
    graph: EdgeGraph,
    t_max: int = 32,
    trans_p: float = 0.5,
    e_time: int = 2,
    i_time: int = 7,
    zero: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """(zero, t, state, count) — the reference's ``getData`` census
    table, states coded S=0 E=1 I=2 R=3."""
    from networkit_spark.graph import random_nodes

    if zero is None:
        zero = random_nodes(graph, k=1, seed=seed)[0]
    zero = int(zero)
    sym = graph.sym().select("src", "dst").persist()
    state = (
        graph.vertices()
        .select(
            F.col("id").alias("node"),
            F.when(F.col("id") == zero, F.lit(I)).otherwise(F.lit(S)).alias("state"),
            F.lit(0).alias("ts"),
        )
        .localCheckpoint(eager=True)
    )
    stats = []
    for t in range(t_max):
        infectious = state.where(F.col("state") == I).select(F.col("node").alias("src"))
        # per-contact Bernoulli: a S node flips if ANY infectious
        # neighbor's draw fires this step
        hit = (
            sym.join(infectious, "src")
            .select(
                F.col("dst").alias("node"),
                (
                    (F.abs(F.xxhash64(F.lit(seed), F.lit(t), "src", "dst")) % 1_000_000_007)
                    / 1_000_000_007.0
                    <= trans_p
                ).alias("fired"),
            )
            .groupBy("node")
            .agg(F.max("fired").alias("exposed_hit"))
        )
        age = F.lit(t) - F.col("ts")
        nxt = (
            state.join(hit, "node", "left")
            .select(
                "node",
                F.when(
                    (F.col("state") == S) & F.coalesce("exposed_hit", F.lit(False)), E
                )
                .when((F.col("state") == E) & (age >= e_time), I)
                .when((F.col("state") == I) & (age >= i_time), R)
                .otherwise(F.col("state"))
                .alias("new_state"),
                "state",
                "ts",
            )
            .select(
                "node",
                F.col("new_state").alias("state"),
                F.when(F.col("new_state") != F.col("state"), F.lit(t))
                .otherwise(F.col("ts"))
                .alias("ts"),
            )
            .localCheckpoint(eager=True)
        )
        state = nxt
        census = {r["state"]: r["c"] for r in
                  state.groupBy("state").agg(F.count(F.lit(1)).alias("c")).collect()}
        for s in (S, E, I, R):
            stats.append((zero, t, s, int(census.get(s, 0))))
    sym.unpersist()
    return graph.spark.createDataFrame(
        stats, "zero long, t long, state long, count long"
    )
