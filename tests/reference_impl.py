"""Pure-numpy exact oracles for the graph algorithms.

igraph is not installed in this sandbox, so the PPR oracle computes the
*same fixed point* prpack solves algebraically
(``igraph.personalized_pagerank(implementation='prpack',
directed=False, weights='weight', reset=...)`` as called at
``/root/reference/src/hipporag/HippoRAG.py:1600-1607``): a dense linear
solve of

    (I − d·Mᵀ − d·r·e_Dᵀ) p = (1−d)·r

where M is the row-stochastic transition matrix of the symmetrized
weighted graph (parallel edges and both orientations summed), D the set
of dangling (zero-incident-weight) vertices whose mass is redistributed
through the reset distribution r (clamped NaN/neg→0, normalized to 1).
``np.linalg.solve`` gives machine-precision agreement with the algebraic
solution, which is a strictly stronger oracle than running power
iteration twice.
"""

from __future__ import annotations

import math

import numpy as np


def _index(edge_rows, reset):
    nodes = sorted(
        {u for u, _, _ in edge_rows} | {v for _, v, _ in edge_rows} | set(reset)
    )
    pos = {n: i for i, n in enumerate(nodes)}
    return nodes, pos


def ppr_exact(edge_rows, reset, damping=0.85):
    """edge_rows: iterable of directed ``(src, dst, weight)`` rows exactly as
    stored in the edge table; reset: dict node_id → raw reset weight."""
    nodes, pos = _index(edge_rows, reset)
    n = len(nodes)
    A = np.zeros((n, n), dtype=np.float64)
    for u, v, w in edge_rows:
        A[pos[u], pos[v]] += w
        A[pos[v], pos[u]] += w
    out = A.sum(axis=1)
    r = np.zeros(n, dtype=np.float64)
    for k, w in reset.items():
        w = float(w)
        r[pos[k]] = 0.0 if (math.isnan(w) or w < 0) else w
    if r.sum() <= 0:
        raise ValueError("reset sums to 0")
    r = r / r.sum()
    M = np.zeros((n, n), dtype=np.float64)
    nz = out > 0
    M[nz] = A[nz] / out[nz, None]
    dangling = (~nz).astype(np.float64)
    S = np.eye(n) - damping * M.T - damping * np.outer(r, dangling)
    p = np.linalg.solve(S, (1.0 - damping) * r)
    return dict(zip(nodes, p))


def components_exact(edge_rows, extra_nodes=()):
    """Connected components via union-find; label = min node id in the
    component (the engine's canonical labeling)."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for u, v, _ in edge_rows:
        union(u, v)
    for x in extra_nodes:
        find(x)
    groups: dict = {}
    for x in parent:
        groups.setdefault(find(x), []).append(x)
    out = {}
    for members in groups.values():
        lab = min(members)
        for m in members:
            out[m] = lab
    return out


def triangles_exact(edge_rows):
    """Global triangle count over the simple undirected graph induced by the
    edge rows (self-loops ignored, multiplicities collapsed)."""
    adj: dict = {}
    for u, v, _ in edge_rows:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    count = 0
    for u in adj:
        for v in adj[u]:
            if not (u < v):
                continue
            for w in adj[u] & adj[v]:
                if v < w:
                    count += 1
    return count


def lpa_exact(edge_rows, max_iter=100):
    """Deterministic semi-synchronous label propagation with min-label
    tie-breaking and md5-first-byte-parity 2-coloring — the same algorithm the
    engine implements (see ``hipporag_spark/lpa.py`` docstring for why
    determinism replaces igraph's randomized
    ``community_label_propagation``)."""
    import hashlib

    adj: dict = {}
    for u, v, w in edge_rows:
        if u == v:
            continue
        adj.setdefault(u, {})
        adj.setdefault(v, {})
        adj[u][v] = adj[u].get(v, 0.0) + w
        adj[v][u] = adj[v].get(u, 0.0) + w
    labels = {x: x for x in adj}
    color = {x: int(hashlib.md5(str(x).encode()).hexdigest()[:2], 16) % 2
             for x in adj}

    def phase(labels, ph):
        new = dict(labels)
        for x in adj:
            if color[x] != ph:
                continue
            scores: dict = {}
            for nb, w in adj[x].items():
                lab = labels[nb]
                scores[lab] = scores.get(lab, 0.0) + w
            if not scores:
                continue
            best = max(scores.values())
            new[x] = min(l for l, s in scores.items() if s == best)
        return new

    for _ in range(max_iter):
        new = phase(phase(labels, 0), 1)
        if new == labels:
            break
        labels = new
    return labels


def coreness_exact(edge_rows):
    """Coreness via the classical sequential Batagelj–Zaveršnik peel
    (min-degree removal) over the simple undirected graph — an
    independent algorithm from both engine paths (distributed h-index
    fixpoint; driver-local peel in hipporag_spark.kcore)."""
    adj: dict = {}
    for u, v, *_ in edge_rows:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    core = {u: len(ns) for u, ns in adj.items()}
    alive = set(adj)
    while alive:
        u = min(alive, key=lambda x: (core[x], str(x)))
        alive.discard(u)
        for v in adj[u]:
            if v in alive and core[v] > core[u]:
                core[v] -= 1
    return core


def bfs_exact(edge_rows, seeds, max_hops):
    """Multi-source BFS hop distances over the simple undirected graph,
    bounded by max_hops; unreached nodes are absent."""
    adj: dict = {}
    for u, v, *_ in edge_rows:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in seeds if s in adj}
    frontier = set(dist)
    for hop in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    nxt.add(v)
        for v in nxt:
            dist[v] = hop
        if not nxt:
            break
        frontier = nxt
    return dist
