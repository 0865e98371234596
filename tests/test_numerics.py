"""Laplacian solvers: CG (identity/diagonal preconditioner),
multi-color Gauss-Seidel, damped Jacobi — against NumPy lstsq."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import EdgeGraph
from networkit_spark.operators.numerics import (
    conjugate_gradient,
    gauss_seidel_relaxation,
    greedy_coloring,
    jacobi_smoother,
    laplacian_matvec,
)

from .conftest import edges_df

ELIST = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 1.0), (2, 3, 1.0), (3, 4, 3.0), (4, 0, 1.0)]
N = 5


def _laplacian():
    L = np.zeros((N, N))
    for a, b, w in ELIST:
        L[a, a] += w
        L[b, b] += w
        L[a, b] -= w
        L[b, a] -= w
    return L


def _b_df(spark, vec):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vec)], "node long, val double"
    )


def test_laplacian_matvec(spark):
    g = EdgeGraph.from_edges(edges_df(spark, ELIST))
    rng = np.random.default_rng(0)
    v = rng.normal(size=N)
    got = laplacian_matvec(g, _b_df(spark, v))
    gv = {r["node"]: r["val"] for r in got.collect()}
    want = _laplacian() @ v
    for i in range(N):
        assert gv[i] == pytest.approx(want[i])


def test_conjugate_gradient_matches_numpy(spark):
    g = EdgeGraph.from_edges(edges_df(spark, ELIST))
    L = _laplacian()
    rng = np.random.default_rng(1)
    raw = rng.normal(size=N)
    b = raw - raw.mean()  # compatible rhs (orthogonal to the nullspace)
    want = np.linalg.lstsq(L, b, rcond=None)[0]
    want -= want.mean()
    for pre in ("identity", "diagonal"):
        x = conjugate_gradient(g, _b_df(spark, b), preconditioner=pre, tol=1e-10)
        gx = {r["node"]: r["x"] for r in x.collect()}
        arr = np.array([gx[i] for i in range(N)])
        arr -= arr.mean()
        assert np.allclose(arr, want, atol=1e-6), pre
        # the solution actually satisfies L x = b
        assert np.allclose(L @ arr, b, atol=1e-6)


def test_conjugate_gradient_multi_system(spark):
    g = EdgeGraph.from_edges(edges_df(spark, ELIST))
    L = _laplacian()
    rows = []
    rng = np.random.default_rng(2)
    systems = {}
    for s in range(3):
        raw = rng.normal(size=N)
        b = raw - raw.mean()
        systems[s] = b
        rows += [(s, i, float(v)) for i, v in enumerate(b)]
    bdf = spark.createDataFrame(rows, "sys long, node long, val double")
    x = conjugate_gradient(g, bdf, tol=1e-10)
    got = {(r["sys"], r["node"]): r["x"] for r in x.collect()}
    for s, b in systems.items():
        arr = np.array([got[(s, i)] for i in range(N)])
        assert np.allclose(L @ arr, b, atol=1e-6), s


def test_greedy_coloring_proper(spark):
    g = EdgeGraph.from_edges(edges_df(spark, ELIST + [(5, 6, 1.0)]))
    col = {r["node"]: r["color"] for r in greedy_coloring(g).collect()}
    assert set(col) == set(range(7))
    for a, b, _ in ELIST + [(5, 6, 1.0)]:
        assert col[a] != col[b]


def test_gauss_seidel_and_jacobi_converge(spark):
    g = EdgeGraph.from_edges(edges_df(spark, ELIST))
    L = _laplacian()
    rng = np.random.default_rng(3)
    raw = rng.normal(size=N)
    b = raw - raw.mean()
    gs = gauss_seidel_relaxation(g, _b_df(spark, b), sweeps=35)
    arr = np.array([{r["node"]: r["x"] for r in gs.collect()}[i] for i in range(N)])
    assert np.allclose(L @ arr, b, atol=1e-3)

    # Jacobi is a smoother, not a solver: residual must strictly shrink
    x1 = jacobi_smoother(g, _b_df(spark, b), sweeps=5)
    a1 = np.array([{r["node"]: r["x"] for r in x1.collect()}[i] for i in range(N)])
    r0 = np.linalg.norm(b)
    r1 = np.linalg.norm(b - L @ a1)
    assert r1 < 0.7 * r0
