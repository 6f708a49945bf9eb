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
import pyarrow as pa

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


def co_activity_edges(ds, type_col: str, ts_col: str, user_col: str,
                      cap: int = 12):
    """Bounded co-activity graph projection: an undirected edge links
    two users active in the same (event_type, epoch-day) bucket.

    Clique projection is the classic scale hazard (one hot bucket with
    B users emits B² pairs), so each bucket keeps only its ``cap``
    SMALLEST distinct user ids under the column's native ordering — a
    deterministic, SQL-replayable cap (``ROW_NUMBER() OVER (PARTITION
    BY bucket ORDER BY user ASC) <= cap``) that bounds the emission at
    C(cap,2) pairs per bucket no matter how hot the bucket is. The
    shuffle carries per-batch-distinct (bucket, user) rows, never raw
    events.

    Returns a Dataset of DISTINCT canonical edges (u < v) in the user
    column's own dtype. Dedup across buckets is one groupby on the
    string edge key — cost bounded by buckets × C(cap,2), not by
    |users|²."""
    from .windows import _epoch_s

    def to_bucket_user(b: pa.Table) -> pa.Table:
        day = (_epoch_s(b[ts_col]) // 86400).astype(np.int64)
        typ = b[type_col].to_numpy(zero_copy_only=False).astype(str)
        df = pd.DataFrame({
            "bucket": np.char.add(np.char.add(typ, "|"),
                                  day.astype(str)),
            "user": b[user_col].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        return pa.table({"bucket": pa.array(df["bucket"], type=pa.string()),
                         "user": pa.array(df["user"],
                                          type=b[user_col].type)})

    user_t = {"t": None}

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        kept = np.sort(pd.unique(g["user"].to_numpy()))[:cap]
        n = len(kept)
        if n < 2:
            return pa.table({"ekey": pa.array([], type=pa.string())})
        i, j = np.triu_indices(n, k=1)
        ek = np.char.add(np.char.add(kept[i].astype(str), "|"),
                         kept[j].astype(str))
        return pa.table({"ekey": pa.array(ek, type=pa.string())})

    def first_edge_fn(dtype):
        def first_edge(g: pd.DataFrame) -> pa.Table:
            u, v = str(g["ekey"].iloc[0]).split("|", 1)
            arr = np.array([u], dtype=dtype), np.array([v], dtype=dtype)
            return pa.table({"u": pa.array(arr[0]),
                             "v": pa.array(arr[1])})
        return first_edge

    # resolve the user column's numpy dtype once (metadata-only read on
    # parquet sources) so edge endpoints keep their native ordering
    sch = ds.schema()
    sch = getattr(sch, "base_schema", sch)
    if hasattr(sch, "field"):
        np_dtype = sch.field(user_col).type.to_pandas_dtype()
    else:
        np_dtype = dict(zip(sch.names, sch.types))[user_col]
    if np_dtype == object:
        np_dtype = str

    pairs = (ds.map_batches(to_bucket_user, batch_format="pyarrow")
             .groupby("bucket").map_groups(bucket_pairs,
                                           batch_format="pandas"))
    return pairs.groupby("ekey").map_groups(first_edge_fn(np_dtype),
                                            batch_format="pandas")


def triangle_count_report(edges, u_col: str = "u",
                          v_col: str = "v") -> pd.DataFrame:
    """Distributed exact triangle count over a distinct canonical edge
    list (u < v), the degree-ordered node-iterator of Suri &
    Vassilvitskii (WWW 2011) / Cohen (2009) composed from Ray Data
    primitives:

      1. degrees — one groupby-count over both endpoints;
      2. orient every edge from its lower-(degree, id) endpoint to the
         higher one (two distributed hash joins against the degree
         table — no broadcast: |V| does not fit a worker at web scale);
      3. wedges — per-source pair emission over the ORIENTED adjacency,
         bounded by O(m^1.5) total thanks to the degree ordering (a
         hub of degree d contributes no wedges as a source: its edges
         point INTO it);
      4. close — hash-co-partition wedge keys with the edge set (one
         union + groupby); a wedge whose closing key is an edge is a
         triangle, each counted exactly once.

    Returns one all-integer row: vertices, edges, wedges (Σ C(d,2) —
    the unordered count, for transitivity), triangles, and
    transitivity_ppm = (3·T·10⁶) // wedges (floor — exact integer).

    The edge list (already an aggregate, bounded far below the input)
    is materialized once because four downstream passes reuse it; at
    web scale the equivalent is a bucketed parquet spill of the edge
    table (stages/bucketed.py), same contract as k-means' budget gate
    (pipelines/clustering.py)."""
    from ray.data.aggregate import Count

    from .relational import hash_join

    edges = edges.materialize()

    sch = edges.schema()
    sch = getattr(sch, "base_schema", sch)
    if hasattr(sch, "field"):
        key_t = sch.field(u_col).type
    else:
        t = dict(zip(sch.names, sch.types))[u_col]
        key_t = pa.string() if t == object else pa.from_numpy_dtype(t)

    def endpoints(b: pa.Table) -> pa.Table:
        u = b[u_col].to_numpy(zero_copy_only=False)
        v = b[v_col].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([u, v]),
                                          type=key_t)})

    degrees = (edges.map_batches(endpoints, batch_format="pyarrow")
               .groupby("node").aggregate(Count(alias_name="dg"))
               .materialize())

    n_vertices = int(degrees.count())
    n_edges = int(edges.count())

    def wedge_partial(b: pa.Table) -> pa.Table:
        d = b["dg"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())],
                                       type=pa.int64())})

    n_wedges = int(degrees.map_batches(
        wedge_partial, batch_format="pyarrow").sum("w") or 0)

    int_t = pa.int64()

    du = degrees.map_batches(
        lambda b: pa.table({u_col: b["node"], "du": b["dg"]}),
        batch_format="pyarrow")
    j1 = hash_join(edges, du, on=u_col, left_cols=[v_col],
                   right_cols=["du"],
                   types={u_col: key_t, v_col: key_t, "du": int_t})
    dv = degrees.map_batches(
        lambda b: pa.table({v_col: b["node"], "dv": b["dg"]}),
        batch_format="pyarrow")
    j2 = hash_join(j1, dv, on=v_col, left_cols=[u_col, "du"],
                   right_cols=["dv"],
                   types={u_col: key_t, v_col: key_t,
                          "du": int_t, "dv": int_t})

    def orient(b: pa.Table) -> pa.Table:
        u = b[u_col].to_numpy(zero_copy_only=False)
        v = b[v_col].to_numpy(zero_copy_only=False)
        du_ = b["du"].to_numpy(zero_copy_only=False)
        dv_ = b["dv"].to_numpy(zero_copy_only=False)
        fwd = (du_ < dv_) | ((du_ == dv_) & (u < v))
        return pa.table({
            "src": pa.array(np.where(fwd, u, v), type=key_t),
            "dst": pa.array(np.where(fwd, v, u), type=key_t)})

    oriented = j2.map_batches(orient, batch_format="pyarrow")

    def src_wedges(g: pd.DataFrame) -> pa.Table:
        ns = np.sort(g["dst"].to_numpy())
        if len(ns) < 2:
            return pa.table({"ekey": pa.array([], type=pa.string()),
                             "is_edge": pa.array([], type=pa.int8())})
        i, j = np.triu_indices(len(ns), k=1)
        ek = np.char.add(np.char.add(ns[i].astype(str), "|"),
                         ns[j].astype(str))
        return pa.table({"ekey": pa.array(ek, type=pa.string()),
                         "is_edge": pa.array(
                             np.zeros(len(ek), dtype=np.int8))})

    def edge_keys(b: pa.Table) -> pa.Table:
        u = b[u_col].to_numpy(zero_copy_only=False)
        v = b[v_col].to_numpy(zero_copy_only=False)
        ek = np.char.add(np.char.add(u.astype(str), "|"),
                         v.astype(str))
        return pa.table({"ekey": pa.array(ek, type=pa.string()),
                         "is_edge": pa.array(
                             np.ones(len(ek), dtype=np.int8))})

    def close_key(g: pd.DataFrame) -> pa.Table:
        flags = g["is_edge"].to_numpy()
        n_edge = int((flags == 1).sum())
        n_wedge = int((flags == 0).sum())
        t = n_wedge if n_edge > 0 else 0
        return pa.table({"tri": pa.array([t], type=pa.int64())})

    tagged = oriented.groupby("src").map_groups(
        src_wedges, batch_format="pandas").union(
        edges.map_batches(edge_keys, batch_format="pyarrow"))
    n_triangles = int(tagged.groupby("ekey").map_groups(
        close_key, batch_format="pandas").sum("tri") or 0)

    trans_ppm = ((3 * n_triangles * 10**6) // n_wedges
                 if n_wedges > 0 else 0)
    return pd.DataFrame({
        "n_vertices": pd.Series([n_vertices], dtype=np.int64),
        "n_edges": pd.Series([n_edges], dtype=np.int64),
        "n_wedges": pd.Series([n_wedges], dtype=np.int64),
        "n_triangles": pd.Series([n_triangles], dtype=np.int64),
        "transitivity_ppm": pd.Series([trans_ppm], dtype=np.int64)})


def triangle_count_from_events(ds, type_col: str, ts_col: str,
                               user_col: str, cap: int = 12) -> pd.DataFrame:
    """Triangle census of the capped user co-activity graph (see
    co_activity_edges for the bounded projection and
    triangle_count_report for the degree-ordered count)."""
    return triangle_count_report(
        co_activity_edges(ds, type_col, ts_col, user_col, cap=cap))


def local_triangle_report(edges, u_col: str = "u", v_col: str = "v",
                          k: int = 10) -> pd.DataFrame:
    """Per-node triangle participation + local clustering coefficient
    over a distinct canonical edge list — the same degree-ordered
    machinery as triangle_count_report, but the wedge rows carry their
    CENTER so each closed wedge (a triangle) is attributed to all three
    vertices in the close step. Output: the top-``k`` nodes by
    (triangles desc, node asc) with exact degree, triangle count and
    cc_ppm = (2·t·10⁶) // (d·(d−1)) — the floor-integer local
    clustering coefficient."""
    from ray.data.aggregate import Count, Sum

    from .relational import hash_join

    edges = edges.materialize()

    sch = edges.schema()
    sch = getattr(sch, "base_schema", sch)
    if hasattr(sch, "field"):
        key_t = sch.field(u_col).type
    else:
        t = dict(zip(sch.names, sch.types))[u_col]
        key_t = pa.string() if t == object else pa.from_numpy_dtype(t)

    def endpoints(b: pa.Table) -> pa.Table:
        u = b[u_col].to_numpy(zero_copy_only=False)
        v = b[v_col].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([u, v]),
                                          type=key_t)})

    degrees = (edges.map_batches(endpoints, batch_format="pyarrow")
               .groupby("node").aggregate(Count(alias_name="dg"))
               .materialize())

    int_t = pa.int64()
    du = degrees.map_batches(
        lambda b: pa.table({u_col: b["node"], "du": b["dg"]}),
        batch_format="pyarrow")
    j1 = hash_join(edges, du, on=u_col, left_cols=[v_col],
                   right_cols=["du"],
                   types={u_col: key_t, v_col: key_t, "du": int_t})
    dv = degrees.map_batches(
        lambda b: pa.table({v_col: b["node"], "dv": b["dg"]}),
        batch_format="pyarrow")
    j2 = hash_join(j1, dv, on=v_col, left_cols=[u_col, "du"],
                   right_cols=["dv"],
                   types={u_col: key_t, v_col: key_t,
                          "du": int_t, "dv": int_t})

    def orient(b: pa.Table) -> pa.Table:
        u = b[u_col].to_numpy(zero_copy_only=False)
        v = b[v_col].to_numpy(zero_copy_only=False)
        du_ = b["du"].to_numpy(zero_copy_only=False)
        dv_ = b["dv"].to_numpy(zero_copy_only=False)
        fwd = (du_ < dv_) | ((du_ == dv_) & (u < v))
        return pa.table({
            "src": pa.array(np.where(fwd, u, v), type=key_t),
            "dst": pa.array(np.where(fwd, v, u), type=key_t)})

    oriented = j2.map_batches(orient, batch_format="pyarrow")

    def src_wedges(g: pd.DataFrame) -> pa.Table:
        ns = np.sort(g["dst"].to_numpy())
        c = g["src"].iloc[0]
        if len(ns) < 2:
            return pa.table({"ekey": pa.array([], type=pa.string()),
                             "center": pa.array([], type=pa.string()),
                             "is_edge": pa.array([], type=pa.int8())})
        i, j = np.triu_indices(len(ns), k=1)
        ek = np.char.add(np.char.add(ns[i].astype(str), "|"),
                         ns[j].astype(str))
        return pa.table({
            "ekey": pa.array(ek, type=pa.string()),
            "center": pa.array(np.full(len(ek), str(c), dtype=object),
                               type=pa.string()),
            "is_edge": pa.array(np.zeros(len(ek), dtype=np.int8))})

    def edge_keys(b: pa.Table) -> pa.Table:
        u = b[u_col].to_numpy(zero_copy_only=False)
        v = b[v_col].to_numpy(zero_copy_only=False)
        ek = np.char.add(np.char.add(u.astype(str), "|"),
                         v.astype(str))
        n = len(ek)
        return pa.table({"ekey": pa.array(ek, type=pa.string()),
                         "center": pa.array([""] * n, type=pa.string()),
                         "is_edge": pa.array(np.ones(n, dtype=np.int8))})

    def close_key(g: pd.DataFrame) -> pa.Table:
        flags = g["is_edge"].to_numpy()
        if not (flags == 1).any():
            return pa.table({"node_str": pa.array([], type=pa.string()),
                             "tri": pa.array([], type=pa.int64())})
        centers = g.loc[g["is_edge"] == 0, "center"].to_numpy()
        m = len(centers)
        if m == 0:
            return pa.table({"node_str": pa.array([], type=pa.string()),
                             "tri": pa.array([], type=pa.int64())})
        a, b = str(g["ekey"].iloc[0]).split("|", 1)
        nodes = np.concatenate([centers.astype(object),
                                np.array([a, b], dtype=object)])
        tri = np.concatenate([np.ones(m, dtype=np.int64),
                              np.array([m, m], dtype=np.int64)])
        return pa.table({"node_str": pa.array(nodes, type=pa.string()),
                         "tri": pa.array(tri)})

    tagged = oriented.groupby("src").map_groups(
        src_wedges, batch_format="pandas").union(
        edges.map_batches(edge_keys, batch_format="pyarrow"))
    per_node = (tagged.groupby("ekey").map_groups(close_key,
                                                  batch_format="pandas")
                .groupby("node_str").aggregate(Sum("tri",
                                                   alias_name="tri"))
                .to_pandas())

    if len(per_node) == 0 or "node_str" not in per_node.columns:
        per_node = pd.DataFrame({"node_str": pd.Series([], dtype=object),
                                 "tri": pd.Series([], dtype=np.int64)})
    deg = degrees.to_pandas()
    deg["node_str"] = deg["node"].astype(str)
    out = deg.merge(per_node, on="node_str", how="left")
    out["tri"] = out["tri"].fillna(0).astype(np.int64)
    out["dg"] = out["dg"].astype(np.int64)
    d = out["dg"].to_numpy()
    t = out["tri"].to_numpy()
    denom = d * (d - 1)
    out["cc_ppm"] = np.where(
        denom > 0, (2 * t * 10**6) // np.maximum(denom, 1),
        0).astype(np.int64)
    out = (out.sort_values(["tri", "node_str"],
                           ascending=[False, True]).head(k)
           [["node", "dg", "tri", "cc_ppm"]]
           .rename(columns={"dg": "degree", "tri": "n_triangles"}))
    return out.reset_index(drop=True)


def local_clustering_from_events(ds, type_col: str, ts_col: str,
                                 user_col: str, cap: int = 12,
                                 k: int = 10) -> pd.DataFrame:
    """Top-k users by triangle participation in the capped co-activity
    graph (see co_activity_edges / local_triangle_report)."""
    return local_triangle_report(
        co_activity_edges(ds, type_col, ts_col, user_col, cap=cap), k=k)


def kcore_report_from_edges(edges, k: int = 3,
                            rounds: int = 4) -> pd.DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983,
    Batagelj–Zaversnik shape): each round drops nodes of degree < k and
    the edges touching them; the fixpoint is the k-core. Runs a FIXED
    ``rounds`` peels (the unrolled-iteration convention shared with the
    integer PageRank oracle) with early-exit bookkeeping: once the edge
    set stops shrinking the remaining rows repeat the converged state,
    and ``converged`` goes 1 — if it is 1 by the last row the reported
    subgraph IS the exact k-core.

    Scale shape per round: one degree groupby-count + two hash
    semi-joins against the surviving-node set (the engine's
    co-partitioned semi-join — no broadcast of |V|); the edge set only
    shrinks, so every round is cheaper than the last. Returns one row
    per round: round, n_nodes, n_edges, converged."""
    from ray.data.aggregate import Count

    from .relational import hash_semi_anti_join

    cur = edges.materialize()
    rows: list[dict] = []
    prev_edges = None
    done = False
    for r in range(1, rounds + 1):
        if done:
            last = rows[-1]
            rows.append({"round": r, "n_nodes": last["n_nodes"],
                         "n_edges": last["n_edges"], "converged": 1})
            continue

        def endpoints(b: pa.Table) -> pa.Table:
            u = b["u"].to_numpy(zero_copy_only=False)
            v = b["v"].to_numpy(zero_copy_only=False)
            return pa.table({"node": pa.array(
                np.concatenate([u, v]))})

        degrees = (cur.map_batches(endpoints, batch_format="pyarrow")
                   .groupby("node").aggregate(Count(alias_name="dg")))

        def keep(b: pa.Table) -> pa.Table:
            m = b["dg"].to_numpy(zero_copy_only=False) >= k
            return pa.table({"node": pa.array(
                np.asarray(b["node"])[m])})

        surv = degrees.map_batches(keep, batch_format="pyarrow") \
            .materialize()

        su = surv.map_batches(lambda b: pa.table({"u": b["node"]}),
                              batch_format="pyarrow")
        e1 = hash_semi_anti_join(cur, su, "u", ["v"])
        sv = surv.map_batches(lambda b: pa.table({"v": b["node"]}),
                              batch_format="pyarrow")
        cur = hash_semi_anti_join(e1, sv, "v", ["u"]).materialize()

        n_edges = int(cur.count())
        n_nodes = int(cur.map_batches(endpoints,
                                      batch_format="pyarrow")
                      .groupby("node").aggregate(
                          Count(alias_name="_c")).count()) \
            if n_edges else 0
        conv = 1 if (prev_edges is not None
                     and n_edges == prev_edges) else 0
        if n_edges == 0:
            conv = 1
        rows.append({"round": r, "n_nodes": n_nodes,
                     "n_edges": n_edges, "converged": conv})
        if conv:
            done = True
        prev_edges = n_edges
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def kcore_from_events(ds, type_col: str, ts_col: str, user_col: str,
                      cap: int = 12, k: int = 3,
                      rounds: int = 4) -> pd.DataFrame:
    """k-core peeling over the capped co-activity graph."""
    return kcore_report_from_edges(
        co_activity_edges(ds, type_col, ts_col, user_col, cap=cap),
        k=k, rounds=rounds)


def degree_assortativity(edges, u_col: str = "u",
                         v_col: str = "v") -> pd.DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over all DIRECTED edge instances
    (each undirected edge contributes (du,dv) and (dv,du), making the
    statistic symmetric). Positive = hubs link hubs; negative =
    hub-and-spoke.

    Same machinery as triangle_count_report's orientation step (two
    distributed hash joins against the degree table — no |V|
    broadcast); the moments are exact integer sums folded with Python
    bignums, and r is ONE fixed IEEE expression from those ints — the
    grouped_pearson exactness contract, bit-identical to the HUGEINT
    SQL oracle. Returns one row: n_edges, assortativity."""
    import math

    from ray.data.aggregate import Count

    from .relational import hash_join

    edges = edges.materialize()

    sch = edges.schema()
    sch = getattr(sch, "base_schema", sch)
    if hasattr(sch, "field"):
        key_t = sch.field(u_col).type
    else:
        t = dict(zip(sch.names, sch.types))[u_col]
        key_t = pa.string() if t == object else pa.from_numpy_dtype(t)

    def endpoints(b: pa.Table) -> pa.Table:
        u = b[u_col].to_numpy(zero_copy_only=False)
        v = b[v_col].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([u, v]),
                                          type=key_t)})

    degrees = (edges.map_batches(endpoints, batch_format="pyarrow")
               .groupby("node").aggregate(Count(alias_name="dg"))
               .materialize())
    int_t = pa.int64()
    du = degrees.map_batches(
        lambda b: pa.table({u_col: b["node"], "du": b["dg"]}),
        batch_format="pyarrow")
    j1 = hash_join(edges, du, on=u_col, left_cols=[v_col],
                   right_cols=["du"],
                   types={u_col: key_t, v_col: key_t, "du": int_t})
    dv = degrees.map_batches(
        lambda b: pa.table({v_col: b["node"], "dv": b["dg"]}),
        batch_format="pyarrow")
    j2 = hash_join(j1, dv, on=v_col, left_cols=[u_col, "du"],
                   right_cols=["dv"],
                   types={u_col: key_t, v_col: key_t,
                          "du": int_t, "dv": int_t})

    def moments(b: pa.Table) -> pa.Table:
        x = b["du"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b["dv"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "m": pa.array([len(x)], type=pa.int64()),
            "sx": pa.array([int(x.sum() + y.sum())], type=pa.int64()),
            "sxy": pa.array([int(2 * (x * y).sum())], type=pa.int64()),
            "sxx": pa.array([int((x * x).sum() + (y * y).sum())],
                            type=pa.int64())})

    mom = j2.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = 2 * int(mom["m"].sum())          # directed pair count
    sx = int(mom["sx"].sum())
    sxy = int(mom["sxy"].sum())
    sxx = int(mom["sxx"].sum())
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    r = (float(num) / math.sqrt(float(den) * float(den))
         if den > 0 else 0.0)
    return pd.DataFrame({
        "n_edges": pd.Series([n // 2], dtype=np.int64),
        "assortativity": pd.Series([r])})


def edge_churn(edges_a, edges_b) -> pd.DataFrame:
    """Temporal graph churn between two edge snapshots: |A|, |B|,
    |A∩B| and the edge Jaccard (ppm floor) — how much of the graph
    survived the period boundary. One union + groupby on the edge key;
    counts only on the exchange."""
    from ray.data.aggregate import Max

    def keyed(side: int):
        def fn(b: pa.Table) -> pa.Table:
            u = b["u"].to_numpy(zero_copy_only=False)
            v = b["v"].to_numpy(zero_copy_only=False)
            ek = np.char.add(np.char.add(u.astype(str), "|"),
                             v.astype(str))
            n = len(ek)
            return pa.table({
                "ekey": pa.array(ek, type=pa.string()),
                "in_a": pa.array(np.full(n, 1 if side == 0 else 0,
                                         dtype=np.int8)),
                "in_b": pa.array(np.full(n, 1 if side == 1 else 0,
                                         dtype=np.int8))})
        return fn

    tagged = (edges_a.map_batches(keyed(0), batch_format="pyarrow")
              .union(edges_b.map_batches(keyed(1),
                                         batch_format="pyarrow")))
    flags = (tagged.groupby("ekey")
             .aggregate(Max("in_a", alias_name="a"),
                        Max("in_b", alias_name="b")))

    def partial(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "na": pa.array([int(a.sum())], type=pa.int64()),
            "nb": pa.array([int(bb.sum())], type=pa.int64()),
            "nc": pa.array([int((a & bb).sum())], type=pa.int64())})

    mom = flags.map_batches(partial, batch_format="pyarrow").to_pandas()
    na, nb, nc = (int(mom["na"].sum()), int(mom["nb"].sum()),
                  int(mom["nc"].sum()))
    union = na + nb - nc
    return pd.DataFrame({
        "n_edges_a": pd.Series([na], dtype=np.int64),
        "n_edges_b": pd.Series([nb], dtype=np.int64),
        "n_common": pd.Series([nc], dtype=np.int64),
        "jaccard_ppm": pd.Series(
            [nc * 10**6 // union if union > 0 else 0],
            dtype=np.int64)})
