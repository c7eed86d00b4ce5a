"""Unit tests for the LIBRARY form of the graph algorithms
(operators/graphalgs.py — judge r11 brief #1).

Everything runs on a hand-built, NON-registry graph with non-default
column names and non-registry parameters, proving the functions work over
arbitrary edge DataFrames — not just the nation trade graph the registry
queries bind them to. (The registry queries themselves remain covered by
tests/test_parity.py's DuckDB oracle gate.) Where the algorithm has a
float result (pagerank, hits, closeness), the expectation comes from a
pure-Python reference twin computed in the test — the
test_curation_lib.py pattern.

The test graph ("barbell-ish", nodes 10-16):

    10 - 11 - 12   (triangle A: 10-11, 11-12, 10-12)
          |
    13              (bridge 11-13)
          |
    14 - 15 - 16   (triangle B: 14-15, 15-16, 14-16; bridge 13-14)

Undirected; tests symmetrize where the function expects it.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.operators import graphalgs

# undirected edge list (a < b), node ids deliberately non-contiguous
UEDGES = [
    (10, 11), (11, 12), (10, 12),          # triangle A
    (11, 13), (13, 14),                    # bridge path
    (14, 15), (15, 16), (14, 16),          # triangle B
]
NODES = sorted({n for e in UEDGES for n in e})
ADJ: dict[int, set[int]] = {n: set() for n in NODES}
for _a, _b in UEDGES:
    ADJ[_a].add(_b)
    ADJ[_b].add(_a)


@pytest.fixture(scope="module")
def sym_edges(spark):
    """Symmetrized directed edge list with NON-default column names."""
    rows = [(a, b) for a, b in UEDGES] + [(b, a) for a, b in UEDGES]
    return spark.createDataFrame(rows, ["frm", "tto"])


@pytest.fixture(scope="module")
def oriented(spark):
    return spark.createDataFrame(UEDGES, ["lo", "hi"])


def rfix(x: float, d: int) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


# ---------------------------------------------------------------------------
# degrees
# ---------------------------------------------------------------------------


def test_degrees(spark, sym_edges):
    out = {r["n"]: r["deg"]
           for r in graphalgs.degrees(sym_edges, src="frm",
                                      out_cols=("n", "deg")).collect()}
    assert out == {n: len(ADJ[n]) for n in NODES}


# ---------------------------------------------------------------------------
# pagerank — vs a pure-Python twin, non-registry damping/iters
# ---------------------------------------------------------------------------


def _py_pagerank(damping: float, iters: int) -> dict[int, float]:
    base = round(1.0 - damping, 12)
    n = float(len(NODES))
    ranks = {v: 1.0 / n for v in NODES}
    outdeg = {v: float(len(ADJ[v])) for v in NODES}
    for _ in range(iters):
        contrib = {v: 0.0 for v in NODES}
        # match Spark's aggregation: sum of rank/od over incoming edges
        for v in NODES:
            for u in sorted(ADJ[v]):  # symmetric: in-neighbors == neighbors
                contrib[v] += ranks[u] / outdeg[u]
        ranks = {v: base / n + damping * contrib[v] for v in NODES}
    return ranks


def test_pagerank_matches_python_twin(spark, sym_edges):
    nodes = spark.createDataFrame([(n,) for n in NODES], ["vertex"])
    out = {r["node"]: r["rank"]
           for r in graphalgs.pagerank(sym_edges, nodes, src="frm", dst="tto",
                                       damping=0.7, iters=3,
                                       digits=6).collect()}
    expect = {v: rfix(r, 6) for v, r in _py_pagerank(0.7, 3).items()}
    assert out == pytest.approx(expect, abs=2e-6)
    # mass conservation: ranks sum to ~1
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_isolated_node_gets_teleport_base(spark, sym_edges):
    nodes = spark.createDataFrame([(n,) for n in NODES + [99]], ["v"])
    out = {r["node"]: r["rank"]
           for r in graphalgs.pagerank(sym_edges, nodes, src="frm", dst="tto",
                                       damping=0.85, iters=2).collect()}
    assert out[99] == pytest.approx(0.15 / 8, abs=1e-6)


# ---------------------------------------------------------------------------
# hits — vs a pure-Python twin on a weighted directed graph
# ---------------------------------------------------------------------------


WEDGES = [(1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 5)]


def _py_hits(digits: int = 8):
    a1 = {v: sum(w for (_s, d, w) in WEDGES if d == v) for v in (1, 2, 3)}
    h1 = {v: sum(w * a1[d] for (s, d, w) in WEDGES if s == v) for v in (1, 2, 3)}
    a2 = {v: sum(w * h1[s] for (s, d, w) in WEDGES if d == v) for v in (1, 2, 3)}
    th, ta = sum(h1.values()), sum(a2.values())
    return ({v: rfix(h1[v] / th, digits) for v in (1, 2, 3)},
            {v: rfix(a2[v] / ta, digits) for v in (1, 2, 3)})


def test_hits_matches_python_twin(spark):
    e = spark.createDataFrame(WEDGES, ["s", "d", "wt"])
    out = {r["node"]: (r["hub_score"], r["auth_score"])
           for r in graphalgs.hits(e, src="s", dst="d", weight="wt",
                                   digits=8).collect()}
    hubs, auths = _py_hits()
    for v in (1, 2, 3):
        assert out[v][0] == pytest.approx(hubs[v], abs=1e-8)
        assert out[v][1] == pytest.approx(auths[v], abs=1e-8)
    # shares are a distribution
    assert sum(h for h, _ in out.values()) == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------------------------
# label propagation — deterministic min-label ties, non-registry rounds
# ---------------------------------------------------------------------------


def _py_lpa(rounds: int) -> dict[int, int]:
    labels = {v: v for v in NODES}
    for _ in range(rounds):
        new = {}
        for v in NODES:
            mass: dict[int, int] = {}
            for u in ADJ[v]:  # unit weights
                mass[labels[u]] = mass.get(labels[u], 0) + 1
            # greatest mass, ties to smallest label
            best = min(mass, key=lambda lbl: (-mass[lbl], lbl))
            new[v] = best
        labels = new
    return labels


def test_label_propagation_matches_python_twin(spark, sym_edges):
    e = sym_edges.withColumn("unit", F.lit(1))
    out = {r["node"]: r["label"]
           for r in graphalgs.label_propagation(e, src="frm", dst="tto",
                                                weight="unit",
                                                rounds=3).collect()}
    assert out == _py_lpa(3)
    # triangle A collapses onto its min label
    assert out[11] == 10 and out[12] == 10


# ---------------------------------------------------------------------------
# k-core — the bridge node 13 (degree 2) peels out of the 3-core
# ---------------------------------------------------------------------------


def test_k_core_peels_bridge(spark, sym_edges):
    surviving = graphalgs.k_core(sym_edges, k=2, rounds=4,
                                 src="frm", dst="tto")
    nodes_left = {r["src"] for r in surviving.select("src").distinct().collect()}
    # 2-core: everyone except nothing (13 has degree 2) — all survive
    assert nodes_left == set(NODES)
    surviving3 = graphalgs.k_core(sym_edges, k=3, rounds=4,
                                  src="frm", dst="tto")
    nodes3 = {r["src"] for r in surviving3.select("src").distinct().collect()}
    # 3-core is empty: after 13 peels (deg 2), 11 and 14 drop to deg 2, and
    # the triangles alone are 2-regular
    assert nodes3 == set()


def test_k_core_respects_round_bound(spark):
    # path 1-2-3-4-5, k=2: peeling cascades inward one layer per round —
    # the rounds parameter is a real knob, not cosmetic
    path = [(1, 2), (2, 3), (3, 4), (4, 5)]
    rows = path + [(b, a) for a, b in path]
    e = spark.createDataFrame(rows, ["frm", "tto"])

    def nodes_after(rounds: int) -> set[int]:
        surv = graphalgs.k_core(e, k=2, rounds=rounds, src="frm", dst="tto")
        return {r["src"] for r in surv.select("src").distinct().collect()}

    assert nodes_after(1) == {2, 3, 4}  # endpoints (deg 1) peel first
    # round 2: 2 and 4 are now deg 1 and peel; node 3 keeps no incident
    # edge, so the surviving EDGE frame is empty — a path has no 2-core
    assert nodes_after(2) == set()


# ---------------------------------------------------------------------------
# triangles / clustering coefficient
# ---------------------------------------------------------------------------


def test_triangle_support(spark, oriented):
    out = {r["v"]: r["tri"]
           for r in graphalgs.triangle_support(
               oriented, a="lo", b="hi", broadcast_wedges=False,
               out_cols=("v", "tri")).collect()}
    # each triangle corner has exactly 1 triangle; bridge node absent
    assert out == {10: 1, 11: 1, 12: 1, 14: 1, 15: 1, 16: 1}


def test_clustering_coefficient(spark, oriented):
    out = {r["node"]: r for r in graphalgs.clustering_coefficient(
        oriented, a="lo", b="hi", digits=4).collect()}
    # triangle-only corners: C = 1.0; deg-3 nodes 11/14: 2*1/(3*2) = 0.3333
    assert out[10]["clustering_coef"] == pytest.approx(1.0)
    assert out[11]["degree"] == 3
    assert out[11]["clustering_coef"] == pytest.approx(0.3333, abs=1e-4)
    # bridge node 13: degree 2, no triangles -> 0.0
    assert out[13]["triangles"] == 0
    assert out[13]["clustering_coef"] == pytest.approx(0.0)


def test_clustering_coefficient_degree1_null(spark):
    e = spark.createDataFrame([(1, 2)], ["lo", "hi"])
    rows = {r["node"]: r["clustering_coef"]
            for r in graphalgs.clustering_coefficient(e, a="lo",
                                                      b="hi").collect()}
    assert rows[1] is None and rows[2] is None  # guarded division


# ---------------------------------------------------------------------------
# link prediction: adamic-adar + jaccard vs python twins
# ---------------------------------------------------------------------------


def _py_adamic_adar() -> dict[tuple[int, int], tuple[int, float]]:
    out = {}
    for a in NODES:
        for b in NODES:
            if a >= b or b in ADJ[a]:
                continue
            common = ADJ[a] & ADJ[b]
            if common:
                out[(a, b)] = (len(common),
                               rfix(sum(1.0 / math.log(len(ADJ[z]))
                                        for z in common), 6))
    return out


def test_adamic_adar_matches_python_twin(spark, sym_edges):
    out = {(r["a"], r["b"]): (r["n_common"], r["aa_score"])
           for r in graphalgs.adamic_adar(sym_edges, src="frm", dst="tto",
                                          digits=6).collect()}
    expect = _py_adamic_adar()
    assert set(out) == set(expect)
    for k in expect:
        assert out[k][0] == expect[k][0]
        assert out[k][1] == pytest.approx(expect[k][1], abs=1e-6)
    # adjacent pairs must NOT be scored
    assert (10, 11) not in out


def _py_jaccard() -> dict[tuple[int, int], tuple[int, float]]:
    out = {}
    for a in NODES:
        for b in NODES:
            if a >= b:
                continue
            common = ADJ[a] & ADJ[b]
            if common:
                out[(a, b)] = (
                    len(common),
                    rfix(len(common) / (len(ADJ[a]) + len(ADJ[b])
                                        - len(common)), 4),
                )
    return out


def test_jaccard_links_matches_python_twin(spark, sym_edges):
    out = {(r["a"], r["b"]): (r["common_neighbors"], r["jaccard"])
           for r in graphalgs.jaccard_links(sym_edges, src="frm", dst="tto",
                                            digits=4).collect()}
    expect = _py_jaccard()
    assert set(out) == set(expect)
    for k in expect:
        assert out[k] == (expect[k][0], pytest.approx(expect[k][1], abs=1e-4))


# ---------------------------------------------------------------------------
# closeness / eccentricity over the multi-root BFS frame
# ---------------------------------------------------------------------------


def _py_hops() -> dict[int, dict[int, int]]:
    dist = {}
    for root in NODES:
        d = {root: 0}
        frontier = [root]
        while frontier:
            nxt = []
            for u in frontier:
                for v in ADJ[u]:
                    if v not in d:
                        d[v] = d[u] + 1
                        nxt.append(v)
            frontier = nxt
        dist[root] = d
    return dist


def test_closeness_stats_matches_python_twin(spark, sym_edges):
    roots = spark.createDataFrame([(n,) for n in NODES], ["r"])
    e = sym_edges.select(F.col("frm").alias("src"), F.col("tto").alias("dst"))
    out = {r["root"]: r for r in graphalgs.closeness_stats(
        spark, e, roots, max_hops=6).collect()}
    hops = _py_hops()
    for v in NODES:
        reached = {u: d for u, d in hops[v].items() if d > 0}
        assert out[v]["n_reached"] == len(reached)
        assert out[v]["sum_hops"] == sum(reached.values())
        assert out[v]["harm"] == pytest.approx(
            sum(1.0 / d for d in reached.values()), abs=1e-9)


def test_eccentricity_stats(spark, sym_edges):
    e = sym_edges.select(F.col("frm").alias("src"), F.col("tto").alias("dst"))
    row = graphalgs.eccentricity_stats(spark, e, max_hops=6).collect()[0]
    hops = _py_hops()
    eccs = {v: max(hops[v].values()) for v in NODES}
    assert row["n_nodes"] == len(NODES)
    assert row["diameter"] == max(eccs.values())
    assert row["radius"] == min(eccs.values())
    assert row["n_center"] == sum(1 for e_ in eccs.values()
                                  if e_ == min(eccs.values()))
    assert row["n_periphery"] == sum(1 for e_ in eccs.values()
                                     if e_ == max(eccs.values()))


def test_eccentricity_hop_cap_truncates(spark, sym_edges):
    # max_hops below the true diameter caps eccentricities at the cap
    e = sym_edges.select(F.col("frm").alias("src"), F.col("tto").alias("dst"))
    row = graphalgs.eccentricity_stats(spark, e, max_hops=2).collect()[0]
    assert row["diameter"] == 2


# ---------------------------------------------------------------------------
# assortativity vs python twin
# ---------------------------------------------------------------------------


def test_degree_assortativity_matches_python_twin(spark, sym_edges):
    xs, ys = [], []
    for a, b in UEDGES:
        for (u, v) in ((a, b), (b, a)):
            xs.append(float(len(ADJ[u])))
            ys.append(float(len(ADJ[v])))
    n = float(len(xs))
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    r = ((n * sxy - sx * sy)
         / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    row = graphalgs.degree_assortativity(sym_edges, src="frm", dst="tto",
                                         digits=6).collect()[0]
    assert row["n_directed_edges"] == len(xs)
    assert row["assortativity"] == pytest.approx(rfix(r, 6), abs=1e-6)


def test_degree_assortativity_regular_graph_null(spark):
    # a 4-cycle is 2-regular: zero degree variance -> NULL, not a crash
    cyc = [(1, 2), (2, 3), (3, 4), (4, 1)]
    rows = cyc + [(b, a) for a, b in cyc]
    e = spark.createDataFrame(rows, ["src", "dst"])
    row = graphalgs.degree_assortativity(e).collect()[0]
    assert row["assortativity"] is None
