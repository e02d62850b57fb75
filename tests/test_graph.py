"""operators/graph.pagerank: integer fixed-point PageRank. Differential
against a transparent pure-Python reference implementing the exact same
integer recurrence, plus the structural edge cases (dangling nodes,
self-loops, disconnected components) and partitioning-invariance."""

from __future__ import annotations

import pytest

from muninn_avro_to_parquet_spark.operators import graph
from muninn_avro_to_parquet_spark.operators.graph import pagerank


def _ref_pagerank(edges, iters=3, dn=85, dd=100, scale=10**12):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out: dict = {}
    for u, _v in edges:
        out[u] = out.get(u, 0) + 1
    base = scale // n
    r = {x: base for x in nodes}
    tele = (dd - dn) * base
    for _ in range(iters):
        dang = sum(r[x] for x in nodes if x not in out)
        infl = {x: 0 for x in nodes}
        for u, v in edges:
            infl[v] += r[u] // out[u]
        r = {x: (tele + dn * (infl[x] + dang // n)) // dd for x in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank_fp"] for r in pagerank(df, **kw).collect()}


def test_matches_reference_with_dangling_and_selfloop(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 4), (2, 4), (3, 6), (2, 2)]
    assert _run(spark, edges) == _ref_pagerank(edges)


def test_bipartite_all_sinks_dangling(spark):
    # every dst is dangling — the entire mass recycles through the
    # dangling path each round (the purchase-graph shape)
    edges = [(1, 10), (2, 10), (2, 11), (3, 11)]
    got = _run(spark, edges)
    assert got == _ref_pagerank(edges)
    assert got[10] > got[11] or got[10] == got[11]  # 10 has more inlinks
    assert got[10] > got[1]  # sinks outrank pure sources here


def test_disconnected_components_and_mass(spark):
    edges = [(1, 2), (2, 1), (10, 11), (11, 12), (12, 10)]
    got = _run(spark, edges, iterations=5)
    assert got == _ref_pagerank(edges, iters=5)
    # truncating arithmetic: total mass within N*iters parts of scale
    assert 0 <= 10**12 - sum(got.values()) <= len(got) * 6 * 100


def test_partitioning_invariance(spark):
    edges = [(i, (i * 7 + 3) % 40) for i in range(40)] + [(i, (i + 1) % 37) for i in range(37)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: r["rank_fp"] for r in pagerank(df).collect()}
    b = {r["node"]: r["rank_fp"] for r in pagerank(df.repartition(13)).collect()}
    assert a == b == _ref_pagerank(edges)


def test_empty_and_bad_params(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty).count() == 0
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping_num=100, damping_den=100)


def _ref_pagerank_weighted(edges, iters=3, dn=85, dd=100, scale=10**12):
    """edges = [(u, v, w)] with positive integer weights."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    n = len(nodes)
    wsum: dict = {}
    for u, _v, w in edges:
        wsum[u] = wsum.get(u, 0) + w
    base = scale // n
    r = {x: base for x in nodes}
    tele = (dd - dn) * base
    for _ in range(iters):
        dang = sum(r[x] for x in nodes if x not in wsum)
        infl = {x: 0 for x in nodes}
        for u, v, w in edges:
            infl[v] += (r[u] * w) // wsum[u]
        r = {x: (tele + dn * (infl[x] + dang // n)) // dd for x in nodes}
    return r


def test_weighted_matches_reference_and_shifts_rank(spark):
    edges = [(1, 2, 9), (1, 3, 1), (2, 3, 4), (3, 1, 2), (4, 3, 7), (3, 5, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, weight_col="w").collect()
    }
    assert got == _ref_pagerank_weighted(edges)
    # weight concentration matters: node 2 receives 9/10 of node 1's
    # mass, so it must outrank node 5 (one light inlink)
    assert got[2] > got[5]
    # and all-equal weights reduce to the unweighted result
    eq = [(u, v, 3) for u, v, _ in edges]
    dfe = spark.createDataFrame(eq, "src long, dst long, w long")
    got_eq = {
        r["node"]: r["rank_fp"] for r in pagerank(dfe, weight_col="w").collect()
    }
    plain = {
        r["node"]: r["rank_fp"]
        for r in pagerank(
            spark.createDataFrame([(u, v) for u, v, _ in edges], "src long, dst long")
        ).collect()
    }
    assert got_eq == plain


def test_empty_edges_keep_input_node_type(spark):
    """A string-keyed (URL/host) graph's empty result must come back
    with a string node column so downstream joins/unions pass analysis
    (ADVICE r10)."""
    empty = spark.createDataFrame([], "src string, dst string")
    out = pagerank(empty)
    assert out.count() == 0
    assert dict(out.dtypes) == {"node": "string", "rank_fp": "bigint"}
    # and it must survive a union with a real string-keyed result
    real = spark.createDataFrame([("a", "b")], "src string, dst string")
    assert pagerank(real).unionByName(out).count() == 2


def test_weight_contract_fails_fast(spark):
    """w <= 0 or NULL would zero a divisor and silently drop rank mass
    (Spark `div` returns NULL on zero divisor); the operator must raise
    during materialization instead (ADVICE r10)."""
    for bad in [0, -3, None]:
        df = spark.createDataFrame(
            [(1, 2, 5), (2, 1, bad)], "src long, dst long, w long"
        )
        with pytest.raises(ValueError, match="positive"):
            pagerank(df, weight_col="w")


def test_pagerank_regime_gate_is_honest(spark):
    """r10 verdict #1's gate test: plant a tiny broadcast threshold and
    the stats block must say "shuffle" (and a generous one "broadcast"),
    with identical ranks either way — the regime is an execution detail,
    never a result detail."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    edges = [(i, (i * 7 + 3) % 40) for i in range(40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    try:
        spark.conf.set(key, "-1")
        s_sh: dict = {}
        got_sh = {r["node"]: r["rank_fp"] for r in pagerank(df, stats=s_sh).collect()}
        spark.conf.set(key, "10MB")
        s_bc: dict = {}
        got_bc = {r["node"]: r["rank_fp"] for r in pagerank(df, stats=s_bc).collect()}
    finally:
        spark.conf.set(key, prev)
    assert s_sh["regime"] == "shuffle"
    assert s_bc["regime"] == "broadcast"
    assert len(s_sh["iter_walls"]) == len(s_bc["iter_walls"]) == 3
    assert got_sh == got_bc == _ref_pagerank(edges)


def test_cc_regime_gate_is_honest(spark):
    """Same planted-threshold honesty check for connected_components:
    the cc_rounds.regime field the bench reports must track the conf."""
    from muninn_avro_to_parquet_spark.operators import dedup

    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    want = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    try:
        spark.conf.set(key, "-1")
        s_sh: dict = {}
        got_sh = {
            (r["node"], r["component_id"])
            for r in dedup.connected_components(pairs, stats=s_sh).collect()
        }
        spark.conf.set(key, "10MB")
        s_bc: dict = {}
        got_bc = {
            (r["node"], r["component_id"])
            for r in dedup.connected_components(pairs, stats=s_bc).collect()
        }
    finally:
        spark.conf.set(key, prev)
    assert s_sh["regime"] == "shuffle"
    assert s_bc["regime"] == "broadcast"
    assert got_sh == got_bc == want


def _py_lpa(edge_list, iterations):
    """Reference synchronous LPA: neighbors' (count desc, label asc)
    winner, keep own label when no neighbors."""
    nbrs: dict = {}
    for a, b in edge_list:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    labels = {n: n for n in nbrs}
    for _ in range(iterations):
        new = {}
        for n in labels:
            counts: dict = {}
            for m in nbrs[n]:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            new[n] = (
                min(counts, key=lambda l: (-counts[l], l)) if counts else labels[n]
            )
        labels = new
    return labels


def test_label_propagation_matches_reference(spark):
    """Two triangles joined by one bridge, plus a pendant: synchronous
    LPA must be bit-identical to the python reference at every
    iteration count — and the bridge must NOT fuse the dense triangles
    the way connected_components would."""
    edge_list = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4), (7, 1)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    for it in (1, 2, 3, 4):
        got = {
            (r["node"], r["label"])
            for r in graph.label_propagation(edges, iterations=it).collect()
        }
        assert got == set(_py_lpa(edge_list, it).items()), f"iterations={it}"
    final = dict(_py_lpa(edge_list, 4))
    assert len({final[n] for n in (1, 2, 3)} | {final[n] for n in (4, 5, 6)}) > 1


def test_label_propagation_regime_gate_is_honest(spark):
    """Same planted-threshold honesty check as pagerank/CC: under a -1
    broadcast threshold the stats must say shuffle, and both regimes
    must agree bit-for-bit."""
    edge_list = [(i, (i * 7 + 1) % 40) for i in range(40)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "-1")
        s_sh: dict = {}
        got_sh = {
            (r["node"], r["label"])
            for r in graph.label_propagation(edges, stats=s_sh).collect()
        }
        spark.conf.set(key, "10MB")
        s_bc: dict = {}
        got_bc = {
            (r["node"], r["label"])
            for r in graph.label_propagation(edges, stats=s_bc).collect()
        }
    finally:
        spark.conf.set(key, prev)
    assert s_sh["regime"] == "shuffle"
    assert s_bc["regime"] == "broadcast"
    assert got_sh == got_bc == set(_py_lpa(edge_list, 3).items())


def _py_hits(edge_list, iterations, scale=10**9):
    """Reference integer fixed-point HITS with L1 normalization."""
    edges = sorted(set(edge_list))
    nodes = sorted({n for e in edges for n in e})
    hub = {n: scale for n in nodes}
    auth = {}
    for _ in range(iterations):
        raw_a = {}
        for u, v in edges:
            raw_a[v] = raw_a.get(v, 0) + hub[u]
        s = sum(raw_a.values())
        auth = {v: (a * scale) // s for v, a in raw_a.items()}
        raw_h = {}
        for u, v in edges:
            if v in auth:
                raw_h[u] = raw_h.get(u, 0) + auth[v]
        s = sum(raw_h.values())
        hub = {u: (h * scale) // s for u, h in raw_h.items()}
    return {
        n: (hub.get(n, 0), auth.get(n, 0)) for n in nodes
    }


def test_hits_matches_reference(spark):
    """Hub/authority separation on a directory-shaped graph: two hub
    pages pointing at three shared authorities plus a chain — integer
    HITS must match the python reference exactly at several depths,
    and the pure hub must carry zero authority (nothing points at it)."""
    edge_list = [
        (100, 1), (100, 2), (100, 3),
        (200, 1), (200, 2), (200, 3),
        (1, 2), (3, 300),
    ]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    for it in (1, 2, 3):
        got = {
            (r["node"], r["hub_fp"], r["auth_fp"])
            for r in graph.hits(edges, iterations=it).collect()
        }
        want = {
            (n, h, a) for n, (h, a) in _py_hits(edge_list, it).items()
        }
        assert got == want, f"iterations={it}"
    final = _py_hits(edge_list, 2)
    assert final[100][1] == 0  # pure hub: no in-edges, zero authority
    assert final[100][0] > final[1][0]  # directory out-hubs the chain
    assert final[1][1] > final[300][1]  # shared authority beats the tail


def test_hits_regime_gate_is_honest(spark):
    edge_list = [(i, (i * 3 + 1) % 30) for i in range(30)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "-1")
        s_sh: dict = {}
        got_sh = {
            tuple(r) for r in graph.hits(edges, stats=s_sh).collect()
        }
        spark.conf.set(key, "10MB")
        s_bc: dict = {}
        got_bc = {
            tuple(r) for r in graph.hits(edges, stats=s_bc).collect()
        }
    finally:
        spark.conf.set(key, prev)
    assert s_sh["regime"] == "shuffle"
    assert s_bc["regime"] == "broadcast"
    want = {
        (n, h, a) for n, (h, a) in _py_hits(edge_list, 2).items()
    }
    assert got_sh == got_bc == want


def _py_ppr(edge_list, seeds, iterations, scale=10**12, num=85, den=100):
    """Reference integer personalized pagerank: teleport and dangling
    mass return to seeds only; contribution per EDGE ROW (parallel
    edges add weight, as the operator documents)."""
    nodes = sorted({n for e in edge_list for n in e})
    deg: dict = {}
    for u, _ in edge_list:
        deg[u] = deg.get(u, 0) + 1
    S = [n for n in nodes if n in seeds]
    base = scale // len(S)
    tel = (den - num) * base
    r = {n: base if n in seeds else 0 for n in nodes}
    for _ in range(iterations):
        infl = {n: 0 for n in nodes}
        for u, v in edge_list:
            infl[v] += r[u] // deg[u]
        dang = sum(r[u] for u in nodes if u not in deg)
        r = {
            v: (
                (tel if v in seeds else 0)
                + num * (infl[v] + (dang // len(S) if v in seeds else 0))
            )
            // den
            for v in nodes
        }
    return r


def test_personalized_pagerank_matches_reference(spark):
    """PPR with a dangling node: teleport and dangling mass must return
    to the seed only, bit-identical to the python reference at several
    depths; seeds=all must equal the classic uniform pagerank."""
    edge_list = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (2, 4)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    for it in (1, 2, 3):
        got = {
            (r["node"], r["rank_fp"])
            for r in pagerank(edges, iterations=it, seeds=seeds).collect()
        }
        assert got == set(_py_ppr(edge_list, {1}, it).items()), f"it={it}"
    all_nodes = spark.createDataFrame([(n,) for n in range(1, 6)], "node long")
    uniform = {
        (r["node"], r["rank_fp"])
        for r in pagerank(edges, iterations=3).collect()
    }
    seeded_all = {
        (r["node"], r["rank_fp"])
        for r in pagerank(edges, iterations=3, seeds=all_nodes).collect()
    }
    assert uniform == seeded_all
    with pytest.raises(ValueError, match="seed"):
        pagerank(
            edges,
            seeds=spark.createDataFrame([(99,)], "node long"),
        )
