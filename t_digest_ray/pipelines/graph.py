"""Graph analytics over distributed edge aggregation: integer PageRank / HITS.

Web-scale text engines need link-graph analytics (PageRank over the host
graph is the canonical example — Page et al. 1999; Kleinberg's HITS 1999
is the hubs/authorities twin). The Ray Data shape used here is the same
one every iterative algorithm in this repo uses (k-means in
clustering.py): the EDGE LIST is aggregated distributedly down to exact
int64 counts — an exchange bounded by |V|² rows, here |event types|² —
and the power iteration then runs on that tiny aggregate with PYTHON
INTEGER arithmetic, so the result is bit-identical at any parallelism
and exactly replayable by an unrolled-CTE HUGEINT SQL oracle. No float
summation (whose order Ray/DuckDB cannot pin) appears anywhere.

Integer PageRank convention (the SQL twin replays it verbatim):

    SCALE = 10**12, damping d = 85/100, fixed ``iters`` rounds
    r_0(v)     = SCALE // N
    inflow_t(v) = sum over edges u->v of (r_t(u) * n_uv) // out_n(u)
    r_{t+1}(v) = (15 * SCALE) // (100 * N) + (85 * inflow_t(v)) // 100

All divisions are floor divisions on non-negative integers (Python
``//`` == DuckDB ``//`` == HUGEINT arithmetic). Dangling mass (nodes
with no out-edges) is DROPPED, not redistributed — the simplest
convention, stated here because both sides must share it.

Integer HITS convention: authority/hub scores start at SCALE, each
round computes the raw weighted sums and re-normalizes by the round's
maximum via ``(x * SCALE) // max`` — keeping every intermediate below
~SCALE² · Σn, comfortably inside HUGEINT/Python-int range, and again
bit-identical everywhere.

At 100 TB the only full-data pass is the edge aggregation (in the
caller, e.g. windows.transition_counts — per-user pair counts, then a
|V|²-sized groupby); the iteration itself touches |V|² integers and is
free. For a host-level web graph (|V| in the millions) the identical
update rule runs as ``iters`` rounds of groupby-sum over the edge
Dataset instead of a driver loop — the convention is deliberately
expressible either way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

PR_SCALE = 10**12
PR_DAMP_NUM = 85
PR_DAMP_DEN = 100


def integer_pagerank(edges: pd.DataFrame, nodes: list[str],
                     iters: int = 3, scale: int = PR_SCALE,
                     src_col: str = "prev_type", dst_col: str = "next_type",
                     n_col: str = "n") -> pd.DataFrame:
    """Exact-integer PageRank on an aggregated weighted edge list.

    ``edges`` is the small aggregate (one row per (src, dst) with an
    exact int64 multiplicity); ``nodes`` is the full vertex set (a
    superset of the edge endpoints — isolated vertices keep teleport
    mass only). Returns one row per node with the scaled rank after
    ``iters`` rounds plus its exact in/out edge weight.
    """
    n_nodes = len(nodes)
    if n_nodes == 0:
        return pd.DataFrame({"node": pd.Series([], dtype=object),
                             "pagerank": pd.Series([], dtype=np.int64),
                             "out_n": pd.Series([], dtype=np.int64),
                             "in_n": pd.Series([], dtype=np.int64)})

    srcs = [str(s) for s in edges[src_col]]
    dsts = [str(d) for d in edges[dst_col]]
    wts = [int(w) for w in edges[n_col]]

    out_n: dict[str, int] = {v: 0 for v in nodes}
    in_n: dict[str, int] = {v: 0 for v in nodes}
    for u, v, w in zip(srcs, dsts, wts):
        out_n[u] += w
        in_n[v] += w

    teleport = (15 * scale) // (PR_DAMP_DEN * n_nodes)
    rank: dict[str, int] = {v: scale // n_nodes for v in nodes}
    for _ in range(iters):
        inflow: dict[str, int] = {v: 0 for v in nodes}
        for u, v, w in zip(srcs, dsts, wts):
            inflow[v] += (rank[u] * w) // out_n[u]
        rank = {v: teleport + (PR_DAMP_NUM * inflow[v]) // PR_DAMP_DEN
                for v in nodes}

    order = sorted(nodes)
    return pd.DataFrame({
        "node": pd.Series(order, dtype=object),
        "pagerank": pd.Series([rank[v] for v in order], dtype=np.int64),
        "out_n": pd.Series([out_n[v] for v in order], dtype=np.int64),
        "in_n": pd.Series([in_n[v] for v in order], dtype=np.int64)})


def integer_hits(edges: pd.DataFrame, nodes: list[str],
                 iters: int = 3, scale: int = PR_SCALE,
                 src_col: str = "prev_type", dst_col: str = "next_type",
                 n_col: str = "n") -> pd.DataFrame:
    """Exact-integer HITS (hubs & authorities) on an aggregated edge list.

    Update rule per round, all floor-div integer arithmetic:

        a_raw(v) = sum over u->v of h(u) * n_uv
        a(v)     = (a_raw(v) * scale) // max_w a_raw(w)   (0 if max is 0)
        h_raw(u) = sum over u->v of a(v) * n_uv
        h(u)     = (h_raw(u) * scale) // max_w h_raw(w)

    Max-normalization (not L2) keeps the arithmetic exact; the top
    authority/hub always scores exactly ``scale``.
    """
    srcs = [str(s) for s in edges[src_col]]
    dsts = [str(d) for d in edges[dst_col]]
    wts = [int(w) for w in edges[n_col]]

    auth: dict[str, int] = {v: scale for v in nodes}
    hub: dict[str, int] = {v: scale for v in nodes}
    for _ in range(iters):
        a_raw: dict[str, int] = {v: 0 for v in nodes}
        for u, v, w in zip(srcs, dsts, wts):
            a_raw[v] += hub[u] * w
        a_max = max(a_raw.values(), default=0)
        auth = ({v: (a_raw[v] * scale) // a_max for v in nodes}
                if a_max > 0 else {v: 0 for v in nodes})
        h_raw: dict[str, int] = {v: 0 for v in nodes}
        for u, v, w in zip(srcs, dsts, wts):
            h_raw[u] += auth[v] * w
        h_max = max(h_raw.values(), default=0)
        hub = ({v: (h_raw[v] * scale) // h_max for v in nodes}
               if h_max > 0 else {v: 0 for v in nodes})

    order = sorted(nodes)
    return pd.DataFrame({
        "node": pd.Series(order, dtype=object),
        "authority": pd.Series([auth[v] for v in order], dtype=np.int64),
        "hub": pd.Series([hub[v] for v in order], dtype=np.int64)})


def markov_argmax_report(edges: pd.DataFrame,
                         src_col: str = "prev_type",
                         dst_col: str = "next_type",
                         n_col: str = "n") -> pd.DataFrame:
    """First-order Markov next-state predictor evaluated exactly in
    one pass over the aggregated edge list: for each source state the
    prediction is the argmax next state (count desc, state asc
    deterministic tie-break) and, because the edge counts ARE the
    empirical next-state distribution, the predictor's exact hit count
    is the predicted edge's own count — no second data pass needed.
    All-integer output, bit-identical at any parallelism."""
    rows = []
    for src, g in edges.groupby(src_col, sort=True):
        g = g.sort_values([n_col, dst_col], ascending=[False, True])
        rows.append((str(src), str(g[dst_col].iloc[0]),
                     int(g[n_col].iloc[0]), int(g[n_col].sum())))
    return pd.DataFrame({
        "prev_type": pd.Series([r[0] for r in rows], dtype=object),
        "pred_type": pd.Series([r[1] for r in rows], dtype=object),
        "n_correct": pd.Series([r[2] for r in rows], dtype=np.int64),
        "n_total": pd.Series([r[3] for r in rows], dtype=np.int64)})


def markov_conditional_entropy(edges: pd.DataFrame,
                               src_col: str = "prev_type",
                               dst_col: str = "next_type",
                               n_col: str = "n") -> pd.DataFrame:
    """Per-source conditional entropy of the empirical transition model,
    H(next | prev=u) = ln(out_u) − (Σ_v n_uv·ln n_uv)/out_u — how
    predictable each state's successor is (0 = deterministic chain,
    ln|types| = uniform). The weighted mean over sources is the Markov
    chain's entropy rate.

    Exactness: counts exact; the only float fold Σ n·ln n accumulates
    in dst-ascending order per source, replayed by the SQL twin's
    SUM(... ORDER BY dst); the closing expression uses one fixed
    parenthesization."""
    import math

    rows = []
    for src, g in edges.groupby(src_col, sort=True):
        g = g.sort_values(dst_col)
        cnt = [int(c) for c in g[n_col]]
        out_n = sum(cnt)
        s = 0.0
        for c in cnt:
            c = float(c)
            s += c * math.log(c)
        h = math.log(float(out_n)) - s / float(out_n)
        rows.append((str(src), out_n, len(cnt), h))
    return pd.DataFrame({
        "prev_type": pd.Series([r[0] for r in rows], dtype=object),
        "out_n": pd.Series([r[1] for r in rows], dtype=np.int64),
        "n_successors": pd.Series([r[2] for r in rows], dtype=np.int64),
        "cond_entropy": pd.Series([r[3] for r in rows])})


def markov_entropy_from_events(ds, user_col: str, ts_col: str,
                               tie_col: str, type_col: str) -> pd.DataFrame:
    """Conditional-entropy report over the events transition graph
    (see markov_accuracy_from_events for the aggregation shape)."""
    from .windows import transition_counts

    edges = transition_counts(ds, user_col, ts_col, tie_col,
                              type_col).to_pandas()
    return markov_conditional_entropy(edges)


def markov_accuracy_from_events(ds, user_col: str, ts_col: str,
                                tie_col: str, type_col: str) -> pd.DataFrame:
    """Markov next-event-type prediction report over the events table:
    distributed exact edge aggregation (windows.transition_counts),
    then the argmax evaluation on the |types|²-bounded aggregate."""
    from .windows import transition_counts

    edges = transition_counts(ds, user_col, ts_col, tie_col,
                              type_col).to_pandas()
    return markov_argmax_report(edges)


def pagerank_from_events(ds, user_col: str, ts_col: str, tie_col: str,
                         type_col: str, iters: int = 3) -> pd.DataFrame:
    """PageRank of event types under the observed per-user transition
    graph: distributed exact edge aggregation (windows.transition_counts
    — per-user pair counts, |types|²-bounded exchange), then the integer
    power iteration on the tiny aggregate. The node set is the full
    distinct ``type_col`` domain, so types that never transition still
    carry teleport mass."""
    from ray.data.aggregate import Count

    from .windows import transition_counts

    edges = transition_counts(ds, user_col, ts_col, tie_col,
                              type_col).to_pandas()
    nodes_df = (ds.select_columns([type_col]).groupby(type_col)
                .aggregate(Count(alias_name="_c")).to_pandas())
    nodes = [str(v) for v in nodes_df[type_col]]
    out = integer_pagerank(edges, nodes, iters=iters)
    return out.rename(columns={"node": type_col})


def hits_from_events(ds, user_col: str, ts_col: str, tie_col: str,
                     type_col: str, iters: int = 3) -> pd.DataFrame:
    """HITS hubs/authorities of event types on the same transition graph
    (see pagerank_from_events for the aggregation shape)."""
    from ray.data.aggregate import Count

    from .windows import transition_counts

    edges = transition_counts(ds, user_col, ts_col, tie_col,
                              type_col).to_pandas()
    nodes_df = (ds.select_columns([type_col]).groupby(type_col)
                .aggregate(Count(alias_name="_c")).to_pandas())
    nodes = [str(v) for v in nodes_df[type_col]]
    out = integer_hits(edges, nodes, iters=iters)
    return out.rename(columns={"node": type_col})
