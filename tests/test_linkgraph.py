"""Link graph: extraction parity vs a pure-Python reference, edge
resolution, anchor postings, and exact-integer PageRank invariants
(partitioning independence, mass conservation, dangling handling).

The DuckDB-oracle check of the PageRank recurrence itself rides on the
contract entry ``q_pagerank`` (tests/test_entry_contract.py runs it
like every other entry); these tests cover the html-extraction side
the documents table cannot exercise (it has no html column).
"""

import re

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.linkgraph import (
    anchor_postings,
    extract_links,
    hits,
    pagerank,
    resolve_edges,
)
from searchengine_spark.sources.corpus import corpus_rows

_A_RE = re.compile(r'<a href="([^"]*)"[^>]*>([^<]*)</a>')
_SITE_RE = re.compile(r"^(https?://[^/]+)")


def _py_links(rows):
    """Pure-Python reference extraction over driver-side corpus rows."""
    out = []
    for r in rows:
        site = _SITE_RE.match(r["url"]).group(1)
        for href, anchor in _A_RE.findall(r["html"].decode("utf-8")):
            if href.startswith(("http://", "https://")):
                dst = href
            elif href.startswith("/"):
                dst = site + href
            else:
                continue
            if dst != r["url"]:
                out.append((r["url"], dst, anchor))
    return out


def _py_pagerank(edges, nodes, n_iter=3, d_num=85, d_den=100, scale=10**12):
    """Driver-side reference of the exact-integer recurrence."""
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: scale // n for v in nodes}
    teleport = ((d_den - d_num) * (scale // n)) // d_den
    for _ in range(n_iter):
        dang = sum(rv for v, rv in r.items() if v not in out)
        c = {}
        for s, d in edges:
            c[d] = c.get(d, 0) + r[s] // out[s]
        r = {
            v: teleport + (d_num * (c.get(v, 0) + dang // n)) // d_den
            for v in nodes
        }
    return r


def test_extract_links_matches_python_reference(spark, corpus_small):
    got = {
        (r["src"], r["dst"], r["anchor"])
        for r in extract_links(corpus_small).collect()
    }
    want = set(_py_links(corpus_rows(300)))
    assert got == want
    assert len(want) > 100  # the corpus actually links


def test_corpus_links_resolve_and_cross_site(spark, corpus_small):
    edges = resolve_edges(extract_links(corpus_small), corpus_small).collect()
    urls = {r["url"] for r in corpus_rows(300)}
    assert len(edges) > 50
    assert all(e["dst"] in urls and e["src"] != e["dst"] for e in edges)

    def site(u):
        return _SITE_RE.match(u).group(1)

    # generator emits both same-site relative and cross-site absolute links
    assert any(site(e["src"]) == site(e["dst"]) for e in edges)
    assert any(site(e["src"]) != site(e["dst"]) for e in edges)
    # dead links (/lNNN) were extracted but must not survive resolution
    raw = extract_links(corpus_small).filter(F.col("dst").contains("/l")).count()
    assert raw > 0
    # distinctness
    assert len(edges) == len({(e["src"], e["dst"]) for e in edges})


def test_anchor_postings_counts_inbound_terms(spark, corpus_small):
    got = {
        (r["url"], r["term"]): r["atf"]
        for r in anchor_postings(extract_links(corpus_small)).collect()
    }
    want = {}
    for _, dst, anchor in _py_links(corpus_rows(300)):
        for t in anchor.lower().split(" "):
            if t:
                want[(dst, t)] = want.get((dst, t), 0) + 1
    assert got == want


def test_pagerank_matches_reference_and_conserves_mass(spark, corpus_small):
    links = extract_links(corpus_small)
    edges_df = resolve_edges(links, corpus_small)
    # full-row duplicate rows share a url — the vertex set is distinct
    nodes_df = corpus_small.select(F.col("url").alias("node")).distinct()
    got = {r["node"]: r["rank"] for r in pagerank(edges_df, nodes_df, 3).collect()}

    edges = [(e["src"], e["dst"]) for e in edges_df.collect()]
    nodes = [r["url"] for r in corpus_rows(300)]
    # full-row duplicate urls collapse in the node frame but not in
    # corpus_rows — dedup the reference node list the same way
    nodes = sorted(set(nodes))
    want = _py_pagerank(edges, nodes)
    assert got == want
    # floor-loss only leaks mass: total ≤ scale, and nothing negative
    total = sum(got.values())
    assert 0 < total <= 10**12
    # the top-ranked page actually has in-links
    indeg = {d for _, d in edges}
    assert max(got, key=got.get) in indeg


def test_pagerank_partitioning_independent(spark, corpus_small):
    links = extract_links(corpus_small)
    edges_df = resolve_edges(links, corpus_small)
    nodes_df = corpus_small.select(F.col("url").alias("node")).distinct()
    a = {r["node"]: r["rank"] for r in pagerank(edges_df, nodes_df, 2).collect()}
    b = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges_df.repartition(7), nodes_df.repartition(3), 2
        ).collect()
    }
    assert a == b


def test_pagerank_all_dangling_is_pure_teleport(spark):
    # no edges at all: every node keeps teleport + damped dangling share
    nodes = spark.createDataFrame([(f"n{i}",) for i in range(5)], ["node"])
    edges = spark.createDataFrame([], "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(edges, nodes, 3).collect()}
    want = _py_pagerank([], [f"n{i}" for i in range(5)])
    assert got == want


@pytest.mark.parametrize("seed", [7, 19, 101, 887, 4242, 90210])
def test_pagerank_random_graph_matches_reference(spark, seed):
    """Seeded-random graphs (dangling nodes, sinks, cycles, dense and
    sparse) vs the driver-side exact-integer reference — the
    partitioning-independence argument says any discrepancy is a
    recurrence bug, not ordering noise."""
    import random as _random

    rng = _random.Random(seed)
    n = rng.randint(2, 25)
    n_iter = rng.randint(1, 3)
    nodes = [f"n{i}" for i in range(n)]
    possible = [(a, b) for a in nodes for b in nodes if a != b]
    m = rng.randint(0, min(len(possible), 4 * n))
    edges = sorted(rng.sample(possible, m))
    if edges:
        edges_df = spark.createDataFrame(edges, "src string, dst string")
    else:
        edges_df = spark.createDataFrame([], "src string, dst string")
    nodes_df = spark.createDataFrame([(v,) for v in nodes], ["node"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges_df, nodes_df, n_iter).collect()
    }
    assert got == _py_pagerank(edges, nodes, n_iter)


def test_pagerank_empty_nodes(spark):
    nodes = spark.createDataFrame([], "node string")
    edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(edges, nodes, 2).count() == 0


def _py_hits(edges, nodes, n_iter=2):
    """Driver-side reference of the exact path-count recurrence."""
    h = {v: 1 for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(n_iter):
        a = {v: 0 for v in nodes}
        for s, d in edges:
            a[d] += h[s]
        h = {v: 0 for v in nodes}
        for s, d in edges:
            h[s] += a[d]
    return h, a


def test_hits_matches_reference_on_corpus_graph(spark, corpus_small):
    edges_df = resolve_edges(extract_links(corpus_small), corpus_small)
    nodes_df = corpus_small.select(F.col("url").alias("node")).distinct()
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(edges_df, nodes_df, 2).collect()
    }
    edges = [(e["src"], e["dst"]) for e in edges_df.collect()]
    nodes = sorted({r["url"] for r in corpus_rows(300)})
    h, a = _py_hits(edges, nodes, 2)
    assert got == {v: (h[v], a[v]) for v in nodes}
    # mutual reinforcement actually happened
    assert max(x[0] for x in got.values()) > 0
    assert max(x[1] for x in got.values()) > 0


@pytest.mark.parametrize("seed", [3, 77, 555, 12321])
def test_hits_random_graph_matches_reference(spark, seed):
    import random as _random

    rng = _random.Random(seed)
    n = rng.randint(2, 20)
    n_iter = rng.randint(1, 3)
    nodes = [f"n{i}" for i in range(n)]
    possible = [(x, y) for x in nodes for y in nodes if x != y]
    edges = sorted(rng.sample(possible, rng.randint(0, len(possible))))
    if edges:
        edges_df = spark.createDataFrame(edges, "src string, dst string")
    else:
        edges_df = spark.createDataFrame([], "src string, dst string")
    nodes_df = spark.createDataFrame([(v,) for v in nodes], ["node"])
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(edges_df, nodes_df, n_iter).collect()
    }
    h, a = _py_hits(edges, nodes, n_iter)
    assert got == {v: (h[v], a[v]) for v in nodes}


# ---------------------------------------------------------------------------
# hits_normalized (web-scale variant, VERDICT r4 #7)
# ---------------------------------------------------------------------------


def _py_hits_normalized(edges, nodes, n_iter, scale):
    """Driver-side reference of the quantized recurrence."""
    h = {v: 1 for v in nodes}
    a = {v: 0 for v in nodes}

    def quant(vals):
        s = sum(vals.values())
        d = s // scale + 1
        return {v: x // d for v, x in vals.items()}

    for _ in range(n_iter):
        a = {v: 0 for v in nodes}
        for s_, d_ in edges:
            a[d_] += h[s_]
        a = quant(a)
        h = {v: 0 for v in nodes}
        for s_, d_ in edges:
            h[s_] += a[d_]
        h = quant(h)
    return h, a


@pytest.mark.parametrize("seed,scale", [(3, 10), (77, 100), (555, 7),
                                        (12321, 1000)])
def test_hits_normalized_random_graph_matches_reference(spark, seed, scale):
    """Quantized HITS == the python reference exactly, at scales small
    enough that the floor-div normalization fires every round."""
    import random as _random

    rng = _random.Random(seed)
    n = rng.randint(2, 20)
    n_iter = rng.randint(1, 4)
    nodes = [f"n{i}" for i in range(n)]
    possible = [(x, y) for x in nodes for y in nodes if x != y]
    edges = sorted(rng.sample(possible, rng.randint(0, len(possible))))
    edges_df = spark.createDataFrame(
        edges or [], "src string, dst string"
    )
    nodes_df = spark.createDataFrame([(v,) for v in nodes], ["node"])
    from searchengine_spark.operators.linkgraph import hits_normalized

    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits_normalized(
            edges_df, nodes_df, n_iter, scale=scale
        ).collect()
    }
    h, a = _py_hits_normalized(edges, nodes, n_iter, scale)
    assert got == {v: (h[v], a[v]) for v in nodes}


@pytest.mark.parametrize("seed", [3, 555])
def test_hits_normalized_equals_exact_when_in_bound(spark, seed):
    """With scale above every half-round sum, the divisor is 1 every
    round and the quantized form is BIT-EQUAL to the exact
    alternating-path-count form — the rank-equality pin VERDICT r4 #7
    asks for, at its strongest (value equality)."""
    import random as _random

    rng = _random.Random(seed)
    n = rng.randint(2, 15)
    nodes = [f"n{i}" for i in range(n)]
    possible = [(x, y) for x in nodes for y in nodes if x != y]
    edges = sorted(rng.sample(possible, rng.randint(1, len(possible))))
    edges_df = spark.createDataFrame(edges, "src string, dst string")
    nodes_df = spark.createDataFrame([(v,) for v in nodes], ["node"])
    from searchengine_spark.operators.linkgraph import hits_normalized

    exact = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(edges_df, nodes_df, 2).collect()
    }
    norm = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits_normalized(
            edges_df, nodes_df, 2, scale=10**15
        ).collect()
    }
    assert norm == exact


def test_hits_normalized_bounded_values(spark):
    """Every emitted value stays < scale — the invariant that removes
    the N^(2t) overflow bound (sums are then <= |E|·scale)."""
    from searchengine_spark.operators.linkgraph import hits_normalized

    nodes = [f"n{i}" for i in range(30)]
    edges = [(a, b) for a in nodes for b in nodes if a != b]
    edges_df = spark.createDataFrame(edges, "src string, dst string")
    nodes_df = spark.createDataFrame([(v,) for v in nodes], ["node"])
    scale = 50
    rows = hits_normalized(edges_df, nodes_df, 4, scale=scale).collect()
    assert all(0 <= r["hub"] < scale and 0 <= r["auth"] < scale
               for r in rows)
    assert any(r["auth"] > 0 for r in rows)
    with pytest.raises(ValueError, match="scale"):
        hits_normalized(edges_df, nodes_df, 1, scale=1)
