"""Entity importance ranking over the KG: fixed-point PageRank.

After canonicalization (canon.py) the mention graph becomes an entity
graph; ranking its nodes is the standard next analytics step (hub
entities drive linking priors and skew planning — the hot entities
E5 salts are exactly the high-rank ones). The reference has no graph
analytics at all; extension family, SURVEY.md §2.9.

Arithmetic is **integer fixed-point** (rank mass scaled by ``SCALE``,
floor division everywhere) rather than floating-point on purpose:
float summation is order-dependent, so a distributed sum and the
oracle's serial sum could drift; integer sums are associative and the
DuckDB replay is bit-exact. The cost is a deliberate, documented mass
leak (floor remainders and dangling nodes), which is fine for ranking —
relative order is what the consumer uses.

Scale shape per iteration: one broadcast-or-shuffle join of the rank
vector (|V| rows) to the edge list, one partial-aggregated groupBy on
dst. ``localCheckpoint`` cuts the lineage each round, exactly like the
CC iteration in canon.py — K rounds means K bounded stages, not one
exponentially-nested plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash32, portable_hash60
from .canon import round_checkpoint, symmetrize

SCALE = 1_000_000_000  # rank mass fixed-point scale
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact rational


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    local_threshold: int = 100_000,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, rank_fp) after ``iterations`` rounds of

        r' = (SCALE - d*SCALE)//N  +  d * Σ_in (r[u] // outdeg[u]) // DEN

    over the directed edge list. ``rank_fp`` is the fixed-point rank
    (divide by SCALE for the [0,1] value). Deterministic and exactly
    replayable cross-engine.

    ``local_threshold``: edge lists at or below this size solve
    driver-side in one collect (the canon.py `cc_local_threshold`
    pattern) — K distributed rounds on a vocabulary-sized graph are
    pure scheduler overhead, and the integer recurrence guarantees the
    two paths return bit-identical ranks (pinned by a pytest). Larger
    graphs take the distributed path automatically; pass 0 to force
    it.

    ``checkpoint_dir``: per-round RELIABLE checkpoints instead of
    localCheckpoint (see :func:`..canon.round_checkpoint`) — executor
    loss replays one round from durable storage, not the whole loop.
    """
    # every round re-reads edges, out-degrees, and the node set — all
    # three persist for the loop's lifetime (AQE breaks ReuseExchange,
    # so without the persist each round would recompute the whole
    # distinct/union pipeline from the source; the CLAUDE.md self-join
    # rule). Rank vectors localCheckpoint EAGERLY per round, the
    # canon.py iteration pattern — a lazy checkpoint defers the whole
    # K-round lineage to the caller's first action and caches nothing.
    # NULL endpoints are meaningless for ranking (and NULL never
    # equi-joins, so a NULL "node" could only ever collect teleport
    # mass while silently eating real mass from its in-edges) — drop
    # them explicitly so both execution paths see the same graph
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
         .distinct().persist())
    if e.isEmpty():
        # no edges (or all NULL-endpoint) → no nodes: n=0 would reach
        # the teleport division on either path. Empty in, empty out.
        e.unpersist()
        id_type = edges.schema[src].dataType.simpleString()
        return edges.sparkSession.createDataFrame(
            [], f"node {id_type}, rank_fp long")
    if local_threshold and e.count() <= local_threshold:
        out = _pagerank_local(e, iterations)
        e.unpersist()
        return out
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct()
             .persist())
    n = nodes.count()  # one job; |V| is entity-vocabulary sized
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    # teleport mass: (1-d)/N in fixed point, exact integer form
    teleport = ((DAMP_DEN - DAMP_NUM) * SCALE) // (DAMP_DEN * n)

    ranks = nodes.select("node", F.lit(SCALE // n).cast("long").alias("rank_fp"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select("dst",
                    F.expr("rank_fp div outdeg").alias("c"))
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        ranks = (
            nodes.join(inflow.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (F.lit(teleport)
                 + F.expr(f"({DAMP_NUM} * coalesce(inflow, 0)) div {DAMP_DEN}")
                 ).cast("long").alias("rank_fp"),
            )
        )
        # eager lineage cut: materialize the round now (reliable when
        # checkpoint_dir is set — see canon.round_checkpoint)
        ranks = round_checkpoint(ranks, checkpoint_dir)
    for handle in (e, nodes, outdeg):
        handle.unpersist()
    return ranks


def _pagerank_local(e: DataFrame, iterations: int) -> DataFrame:
    """Driver-side twin of the exact recurrence for sub-threshold
    graphs; one collect, zero iterative jobs."""
    rows = [(r["src"], r["dst"]) for r in e.collect()]
    nodes = sorted({u for u, _ in rows} | {v for _, v in rows})
    n = len(nodes)
    outdeg: dict = {}
    for u, _ in rows:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {v: SCALE // n for v in nodes}
    teleport = ((DAMP_DEN - DAMP_NUM) * SCALE) // (DAMP_DEN * n)
    for _ in range(iterations):
        inflow = {v: 0 for v in nodes}
        for u, v in rows:
            inflow[v] += r[u] // outdeg[u]
        r = {v: teleport + (DAMP_NUM * inflow[v]) // DAMP_DEN
             for v in nodes}
    id_type = e.schema["src"].dataType.simpleString()
    return e.sparkSession.createDataFrame(
        [(v, r[v]) for v in nodes], f"node {id_type}, rank_fp long")


def pagerank_oracle_sql(edges_cte: str, iterations: int = 5) -> str:
    """DuckDB twin: the same fixed-point recurrence unrolled into one
    CTE chain per iteration (DuckDB's recursive CTEs can't carry an
    aggregate per step, but K is small and known)."""
    sql = [f"with e as (select distinct src, dst from ({edges_cte})),"]
    sql.append(
        "nodes as (select src as node from e union "
        "select dst as node from e),")
    sql.append("nn as (select count(*) as n from nodes),")
    sql.append("outdeg as (select src, count(*) as outdeg from e "
               "group by src),")
    sql.append(
        f"r0 as (select node, {SCALE} // (select n from nn) as rank_fp "
        "from nodes),")
    for i in range(iterations):
        prev, cur = f"r{i}", f"r{i + 1}"
        sql.append(
            f"inflow{i} as (select e.dst, "
            f"sum({prev}.rank_fp // outdeg.outdeg) as inflow "
            f"from e join {prev} on {prev}.node = e.src "
            "join outdeg on outdeg.src = e.src group by e.dst),")
        sql.append(
            f"{cur} as (select nodes.node, "
            f"({(DAMP_DEN - DAMP_NUM) * SCALE} // "
            f"({DAMP_DEN} * (select n from nn)))"
            f" + ({DAMP_NUM} * coalesce(inflow{i}.inflow, 0)) // {DAMP_DEN}"
            " as rank_fp "
            f"from nodes left join inflow{i} on inflow{i}.dst = nodes.node),")
    body = "\n".join(sql).rstrip(",")
    return f"{body}\nselect node, cast(rank_fp as bigint) as rank_fp " \
           f"from r{iterations}"


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle counting with the degree-ordering bound — the
    standard local-clustering / community-density signal for entity
    graphs. Input: undirected edges ``(src, dst)`` (duplicates, self
    loops, and both orientations tolerated). Returns one row
    ``(n_triangles, n_edges, n_wedges)``; the wedge count is the
    denominator of the global clustering coefficient
    ``3·triangles / wedges``.

    The naive 3-way self-join shuffles Σ d(v)² wedge candidates — a hub
    with a million neighbors contributes 10¹² wedges. Orienting every
    edge from its lower-(degree, id) endpoint to the higher one caps
    out-degree at O(√m), so oriented wedges are at most m^1.5 total
    (Schank/Wagner): one join on the wedge pivot, then a semi-join of
    the closing edge against the oriented edge set. Three shuffles —
    degree agg, wedge join, closing join — all on edge-shaped rows.

    The canonical edge set and the oriented edges are PERSISTED for
    the duration of the call (edge-shaped, the bounded input): the
    function runs three actions and the oriented table alone has three
    consumers — with AQE breaking exchange reuse, an expensive caller
    pipeline would otherwise re-execute per consumer. Both caches are
    freed before returning (the result is a materialized 1-row frame).
    """
    e = (edges.select(F.col("src").cast("string").alias("a"),
                      F.col("dst").cast("string").alias("b"))
         .where(F.col("a") != F.col("b"))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .dropDuplicates()
         .persist())
    deg = (e.select(F.explode(F.array("a", "b")).alias("v"))
           .groupBy("v").agg(F.count("*").alias("d")))
    ranked = (
        e.join(deg.withColumnRenamed("v", "a")
               .withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("v", "b")
              .withColumnRenamed("d", "db"), "b")
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = ranked.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("w")
    ).persist()
    try:
        o1, o2 = oriented.alias("o1"), oriented.alias("o2")
        wedges = (
            o1.join(o2, F.col("o1.u") == F.col("o2.u"))
            .where(F.col("o1.w") < F.col("o2.w"))
            .select(F.col("o1.w").alias("x"), F.col("o2.w").alias("y"))
        )
        closing = oriented.select(
            F.least("u", "w").alias("x"), F.greatest("u", "w").alias("y"))
        tri = wedges.join(closing.dropDuplicates(), ["x", "y"], "left_semi")

        n_edges = e.count()
        # wedges for the clustering coefficient use RAW degrees: Σ C(d,2)
        n_wedges = deg.agg(
            F.sum(F.expr("d * (d - 1) div 2")).cast("long")).first()[0] or 0
        n_tri = tri.count()
    finally:
        oriented.unpersist(), e.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(int(n_tri), int(n_edges), int(n_wedges))],
        "n_triangles long, n_edges long, n_wedges long")


def kcore(
    edges: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    local_threshold: int = 100_000,
    max_rounds: int = 200,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """k-core decomposition by iterative peeling: the maximal subgraph
    of the undirected simple graph in which every node keeps degree
    >= ``k``. Returns ``(node, kept)`` for every node of the simple
    graph — kept = 1 inside the core. The standard density screen for
    entity graphs: the k-core isolates the tightly-linked entity
    communities that survive after dedup/canonicalization, and it's
    the classic pre-filter before quadratic-ish community algorithms.

    Peeling is a fixpoint, not a fixed round count: drop sub-k nodes,
    re-derive degrees on the shrunken edge set, repeat until no node
    falls. Per round: one explode+groupBy degree aggregate and one
    two-sided semi-join of the edge list — all edge-shaped shuffles,
    with :func:`round_checkpoint` cutting lineage per round exactly
    like the CC/PageRank loops (reliable checkpoints when
    ``checkpoint_dir`` is set). The round count is bounded by the peel
    depth (degeneracy ordering), in practice tens of rounds; a graph
    that hasn't converged after ``max_rounds`` raises rather than
    returning a superset silently.

    Sub-``local_threshold`` edge lists peel driver-side in one collect
    (the canon.py local-twin pattern); the set-arithmetic recurrence is
    identical, so both paths return the same rows (pinned by pytest).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e0 = (edges.select(F.col(src).cast("string").alias("a"),
                       F.col(dst).cast("string").alias("b"))
          .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                 & (F.col("a") != F.col("b")))
          .select(F.least("a", "b").alias("a"),
                  F.greatest("a", "b").alias("b"))
          .dropDuplicates()
          .persist())
    spark = edges.sparkSession
    n_edges = e0.count()
    if n_edges == 0:
        e0.unpersist()
        return spark.createDataFrame([], "node string, kept int")
    nodes = (e0.select(F.explode(F.array("a", "b")).alias("node"))
             .dropDuplicates().persist())
    if n_edges <= local_threshold:
        out = _kcore_local(e0, nodes, k)
        e0.unpersist(), nodes.unpersist()
        return out
    cur = e0
    cur_edges = n_edges
    for _ in range(max_rounds):
        deg = (cur.select(F.explode(F.array("a", "b")).alias("v"))
               .groupBy("v").agg(F.count("*").alias("d")))
        keep = deg.where(F.col("d") >= k).select("v")
        nxt = (cur.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
               .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
               .select("a", "b"))
        nxt = round_checkpoint(nxt, checkpoint_dir)
        n = nxt.count()
        if n == cur_edges:
            core = keep.withColumnRenamed("v", "node")
            out = (nodes.join(core.withColumn("kept", F.lit(1)),
                              "node", "left")
                   .select("node",
                           F.coalesce("kept", F.lit(0)).alias("kept")))
            out = out.localCheckpoint()
            e0.unpersist(), nodes.unpersist()
            return out
        cur, cur_edges = nxt, n
        if n == 0:
            # every node peeled: short-circuit, all kept = 0
            out = nodes.select("node", F.lit(0).alias("kept"))
            out = out.localCheckpoint()
            e0.unpersist(), nodes.unpersist()
            return out
    raise RuntimeError(
        f"kcore did not converge in {max_rounds} rounds — raise "
        "max_rounds (peel depth exceeds the bound)")


def _kcore_local(e0: DataFrame, nodes: DataFrame, k: int) -> DataFrame:
    """Driver-side peel for sub-threshold graphs: identical set
    recurrence, one collect, zero iterative jobs."""
    edges = {(r["a"], r["b"]) for r in e0.collect()}
    all_nodes = sorted(r["node"] for r in nodes.collect())
    while True:
        deg: dict = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in edges if a in keep and b in keep}
        if nxt == edges:
            break
        edges = nxt
    core = {v for pair in edges for v in pair}
    # fixpoint edge set's qualifying nodes == its endpoints (every
    # endpoint has degree >= k at fixpoint), except the empty case
    return e0.sparkSession.createDataFrame(
        [(v, 1 if v in core else 0) for v in all_nodes],
        "node string, kept int")


def kcore_oracle_sql(edges_cte: str, k: int, rounds: int) -> str:
    """DuckDB twin: the peel unrolled to ``rounds`` chained CTE stages
    (one degree-filter + edge-restriction pair per round). ``rounds``
    must be >= the fixture graph's true peel depth — pin that with a
    pytest on the Python twin, the oracle can't detect shortfall."""
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    # round references its predecessor three times — an inlined chain
    # expands 3^rounds scans of the base table (observed: fd exhaustion
    # on the parquet view at rounds=8)
    sql = [
        f"with base as ({edges_cte}),",
        "e0 as materialized (select distinct least(a, b) as a, "
        "greatest(a, b) as b "
        "from base where a is not null and b is not null and a <> b),",
        "alln as (select distinct v as node from "
        "(select a as v from e0 union all select b from e0)),",
    ]
    for i in range(rounds):
        p, c = f"e{i}", f"e{i + 1}"
        sql.append(
            f"k{i} as materialized (select v from (select a as v from {p} "
            f"union all select b from {p}) group by v "
            f"having count(*) >= {k}),")
        sql.append(
            f"{c} as materialized (select a, b from {p} "
            f"where a in (select v from k{i}) "
            f"and b in (select v from k{i})),")
    sql.append(
        f"core as (select distinct v as node from "
        f"(select a as v from e{rounds} union all "
        f"select b from e{rounds}))")
    body = "\n".join(sql)
    return (f"{body}\n"
            "select alln.node, case when core.node is not null "
            "then 1 else 0 end as kept\n"
            "from alln left join core on alln.node = core.node")


WALK_SALT = "walk-v1"


def random_walks(
    edges: DataFrame,
    walk_len: int = 5,
    walks_per_node: int = 1,
    src: str = "src",
    dst: str = "dst",
    salt: str = WALK_SALT,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Deterministic uniform random walks over the undirected simple
    graph — the DeepWalk/node2vec(p=q=1) corpus generator: feed the
    ``(walk_id, step, node)`` paths to any sequence-embedding trainer
    to get structural entity embeddings.

    "Random" is hash-random: step t of walk w moves to neighbor index
    ``md5(walk_id, t, salt) mod degree(cur)`` over the current node's
    dst-sorted neighbor list. That keeps the walks (a) reproducible
    across runs, task retries, and engines — the DuckDB twin replays
    every path bit-for-bit, which no PRNG-seeded-per-task scheme
    survives — and (b) i.i.d.-uniform per step for embedding purposes.

    Scale shape: the neighbor list (one row_number window per src
    partition) and degree table build once and PERSIST for the loop;
    each of the ``walk_len`` steps is one hash equi-join of the
    walk-frontier (|V| x walks_per_node rows) against them, lineage
    cut per step via :func:`round_checkpoint`. No collect anywhere;
    the frontier never exceeds its starting size (walks can only end
    early at... nothing — undirected simple graphs have no sinks).

    Returns the long form ``(walk_id, step, node)`` with step 0 = the
    start node; isolated nodes (no edges) start no walks.
    """
    if walk_len < 1 or walks_per_node < 1:
        raise ValueError("walk_len and walks_per_node must be >= 1")
    e = (edges.select(F.col(src).cast("string").alias("a"),
                      F.col(dst).cast("string").alias("b"))
         .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                & (F.col("a") != F.col("b")))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .dropDuplicates())
    both = (e.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .union(e.select(F.col("b").alias("u"), F.col("a").alias("v"))))
    from pyspark.sql import Window

    nbr = both.select(
        "u", "v",
        (F.row_number().over(
            Window.partitionBy("u").orderBy("v")) - 1).alias("idx"),
    ).persist()
    deg = nbr.groupBy("u").agg(F.count("*").alias("deg")).persist()
    frontier = (
        deg.select("u").crossJoin(
            edges.sparkSession.range(walks_per_node)
            .select(F.col("id").alias("w")))
        .select(F.concat(F.col("u"), F.lit("#"),
                         F.col("w").cast("string")).alias("walk_id"),
                F.col("u").alias("cur")))
    out = frontier.select("walk_id", F.lit(0).alias("step"),
                          F.col("cur").alias("node"))
    paths = [out]
    cur = frontier
    for t in range(1, walk_len + 1):
        pick = (
            cur.join(deg.withColumnRenamed("u", "cur"), "cur")
            .select(
                "walk_id",
                (portable_hash60(F.concat_ws(
                    "\x1f", F.col("walk_id"), F.lit(str(t)),
                    F.lit(salt))) % F.col("deg")).alias("idx"),
                F.col("cur"))
        )
        cur = (pick.join(nbr.withColumnRenamed("u", "cur"),
                         ["cur", "idx"])
               .select("walk_id", F.col("v").alias("cur")))
        cur = round_checkpoint(cur, checkpoint_dir)
        paths.append(cur.select("walk_id", F.lit(t).alias("step"),
                                F.col("cur").alias("node")))
    result = paths[0]
    for p in paths[1:]:
        result = result.unionByName(p)
    result = result.localCheckpoint()
    nbr.unpersist(), deg.unpersist()
    return result


def random_walks_oracle_sql(edges_cte: str, walk_len: int,
                            walks_per_node: int = 1,
                            salt: str = WALK_SALT) -> str:
    """DuckDB twin: the walk unrolled one CTE per step with identical
    md5 index arithmetic (MATERIALIZED — each step is referenced by
    the next and by the final union)."""
    h = (f"cast(concat('0x', substr(md5(walk_id || chr(31) || '{{t}}' "
         f"|| chr(31) || '{salt}'), 1, 15)) as bigint)")
    sql = [
        f"with base as ({edges_cte}),",
        "e as materialized (select distinct least(a, b) as a, "
        "greatest(a, b) as b from base "
        "where a is not null and b is not null and a <> b),",
        # "both" is a reserved word in DuckDB (TRIM syntax)
        "bidir as (select a as u, b as v from e "
        "union all select b as u, a as v from e),",
        "nbr as materialized (select u, v, "
        "row_number() over (partition by u order by v) - 1 as idx "
        "from bidir),",
        "deg as materialized (select u, count(*) as deg from nbr "
        "group by u),",
        "w0 as materialized (select u || '#' || cast(i as varchar) "
        "as walk_id, u as cur from deg cross join "
        f"(select unnest(range({walks_per_node})) as i)),",
    ]
    for t in range(1, walk_len + 1):
        p, c = f"w{t - 1}", f"w{t}"
        idx = h.format(t=t)
        sql.append(
            f"{c} as materialized (select {p}.walk_id, nbr.v as cur "
            f"from {p} join deg on deg.u = {p}.cur "
            f"join nbr on nbr.u = {p}.cur "
            f"and nbr.idx = ({idx}) % deg.deg),")
    steps = ["select walk_id, 0 as step, cur as node from w0"]
    steps += [f"select walk_id, {t} as step, cur as node from w{t}"
              for t in range(1, walk_len + 1)]
    body = "\n".join(sql).rstrip(",")
    return body + "\n" + "\nunion all\n".join(steps)


def label_propagation(
    edges: DataFrame,
    rounds: int = 5,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation with a
    deterministic tie-break: every round, each node adopts the most
    frequent label among its neighbors, ties going to the smallest
    label; all nodes update simultaneously from the previous round's
    labels. Classic LPA is run-order random — useless for a replayable
    pipeline — while the synchronous min-tie variant is a pure
    function of (graph, rounds): the same discipline as the hash-random
    walks. Fixed ``rounds`` rather than convergence: synchronous LPA
    can 2-cycle on bipartite-ish regions (documented behavior;
    communities stabilize long before labels formally converge).

    Per round: one join of the label vector to the bidirectional edge
    list + two aggregates (neighbor-label counts, then per-node argmax
    via ``min_by`` over (count desc, label asc)), lineage cut per
    round. Returns ``(node, label)`` with labels drawn from node ids
    (a community is named by one of its members).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = (edges.select(F.col(src).cast("string").alias("a"),
                      F.col(dst).cast("string").alias("b"))
         .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                & (F.col("a") != F.col("b")))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .dropDuplicates())
    bidir = (e.select(F.col("a").alias("u"), F.col("b").alias("v"))
             .union(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
             ).persist()
    labels = bidir.select(F.col("u").alias("node")).distinct() \
        .select("node", F.col("node").alias("label"))
    for _ in range(rounds):
        counts = (
            bidir.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u", "label").agg(F.count("*").alias("c")))
        labels = (
            counts.groupBy("u")
            .agg(F.min(F.struct(
                (-F.col("c")).alias("_nc"), F.col("label")))
                .alias("_best"))
            .select(F.col("u").alias("node"),
                    F.col("_best.label").alias("label")))
        labels = round_checkpoint(labels, checkpoint_dir)
    bidir.unpersist()
    return labels


def label_propagation_py(edges, rounds):
    """Pure-Python twin of :func:`label_propagation`."""
    e = {(a, b) if a < b else (b, a) for a, b in edges
         if a is not None and b is not None and a != b}
    adj: dict = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v, nbrs in adj.items():
            counts: dict = {}
            for n in nbrs:
                counts[labels[n]] = counts.get(labels[n], 0) + 1
            nxt[v] = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = nxt
    return labels


def label_propagation_oracle_sql(edges_cte: str, rounds: int) -> str:
    """DuckDB twin of :func:`label_propagation`: one MATERIALIZED CTE
    per synchronous round, argmax via row_number over (count desc,
    label asc) — the identical tie-break."""
    sql = [
        f"with base as ({edges_cte}),",
        "e as materialized (select distinct least(a, b) as a, "
        "greatest(a, b) as b from base "
        "where a is not null and b is not null and a <> b),",
        "bidir as materialized (select a as u, b as v from e "
        "union all select b as u, a as v from e),",
        "l0 as materialized (select distinct u as node, u as label "
        "from bidir),",
    ]
    for i in range(rounds):
        sql.append(
            f"l{i + 1} as materialized (select u as node, label from ("
            "select b.u, l.label, "
            "row_number() over (partition by b.u "
            "order by count(*) desc, l.label) as rn "
            f"from bidir b join l{i} l on l.node = b.v "
            "group by b.u, l.label) where rn = 1),")
    body = "\n".join(sql).rstrip()
    assert body.endswith("),")
    body = body[:-2] + ")"
    return body + f"\nselect node, label from l{rounds}"


# AA contributions in units of 1e-9: aa_w = floor(1e9 / log2_fp(d)).
# log2 vs the textbook ln is a constant factor (ln 2) shared by every
# candidate, so rankings are unchanged — and the integer pipeline stays
# engine-exact where libm log() flips floor boundaries.
AA_SCALE = 1_000_000_000


def link_prediction(
    edges: DataFrame,
    min_cn: int = 1,
    max_pivot_degree: int = 10_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Link-prediction candidate mining: for every NON-adjacent node
    pair sharing at least ``min_cn`` neighbors, the two classic
    topological scores — common-neighbor count and Adamic-Adar
    (``sum over shared neighbors w of 1/log degree(w)``) — the
    candidate generator for KG-completion / KG-embedding training that
    pairs with :func:`~cow_spark.operators.kgtrain.negative_samples`
    (positives-to-rank vs corrupted negatives). Returns canonical rows
    ``(x, y, cn, aa_fp)`` with ``x < y`` and ``aa_fp`` in integer 1e-9
    units (engine-exact: the fixed-point log2 kernel, no libm).

    Scale shape: wedge generation is one self-join of the adjacency
    list on the pivot — Σ d(w)² pair candidates, the same blow-up the
    triangle census bounds by degree-ordering. Ranking scores need both
    endpoints' full neighborhoods, so the orientation trick doesn't
    apply; instead pivots with degree > ``max_pivot_degree`` are
    DROPPED (a 10k-degree hub contributes 10⁸ wedges and an AA weight
    of < 1/13 bit — the signal Adamic-Adar is designed to discount, so
    the cap loses candidates only where every shared neighbor is a
    mega-hub). The cap is part of the operator's definition —
    reproducible, and replayed by the oracle. Pivot degree < 2 never
    forms a wedge and is filtered before the log kernel (log2(1) = 0
    would divide by zero). The canonical edge table is persisted (two
    consumers: adjacency + the non-adjacency anti-join; AQE breaks
    exchange reuse) — the handle rides the result for
    :func:`~cow_spark.operators.dedup.release`.
    """
    from ..functions.intmath import with_log2_fp

    if min_cn < 1:
        raise ValueError(f"min_cn must be >= 1, got {min_cn}")
    if max_pivot_degree < 2:
        raise ValueError(
            f"max_pivot_degree must be >= 2, got {max_pivot_degree}")
    e = (edges.select(F.col(src).cast("string").alias("a"),
                      F.col(dst).cast("string").alias("b"))
         .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                & (F.col("a") != F.col("b")))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .dropDuplicates()
         .persist())
    # adjacency in ONE pass (explode, not union — union re-executes the
    # upstream per branch)
    adj = e.select(F.explode(F.array(
        F.struct(F.col("a").alias("w"), F.col("b").alias("v")),
        F.struct(F.col("b").alias("w"), F.col("a").alias("v")),
    )).alias("p")).select("p.w", "p.v")
    deg = adj.groupBy("w").agg(F.count("*").alias("d"))
    wdeg = with_log2_fp(
        deg.where((F.col("d") >= 2) & (F.col("d") <= max_pivot_degree)),
        "d", "_l2"
    ).select("w", F.expr(f"{AA_SCALE} div _l2").alias("aa_w"))
    # wedge pairs: distinct-neighbor pairs of each retained pivot,
    # pivot weight attached before the self-join so it rides the rows
    adjw = adj.join(wdeg, "w")
    lhs = adjw.select("w", F.col("v").alias("x"), "aa_w")
    rhs = adjw.select(F.col("w").alias("w2"), F.col("v").alias("y"))
    scored = (
        lhs.join(rhs, F.col("w") == F.col("w2"))
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("cn"), F.sum("aa_w").alias("aa_fp")))
    out = (scored.join(e, (scored["x"] == e["a"]) & (scored["y"] == e["b"]),
                       "left_anti")
           .where(F.col("cn") >= min_cn))
    out._cow_persisted = (e,)  # type: ignore[attr-defined]
    return out


def link_prediction_py(edges, min_cn: int = 1,
                       max_pivot_degree: int = 10_000):
    """Pure-Python twin of :func:`link_prediction`."""
    from ..functions.intmath import log2_fp_py

    e = {(a, b) if a < b else (b, a) for a, b in edges
         if a is not None and b is not None and a != b}
    adj: dict = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores: dict = {}
    for w, nbrs in adj.items():
        d = len(nbrs)
        if d < 2 or d > max_pivot_degree:
            continue
        aa_w = AA_SCALE // log2_fp_py(d)
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                key = (ns[i], ns[j])
                cn, aa = scores.get(key, (0, 0))
                scores[key] = (cn + 1, aa + aa_w)
    return {k: v for k, v in scores.items()
            if k not in e and v[0] >= min_cn}


def link_prediction_oracle_sql(edges_cte: str, min_cn: int = 1,
                               max_pivot_degree: int = 10_000) -> str:
    """DuckDB twin of :func:`link_prediction` (same cap, same integer
    Adamic-Adar units via the list_reduce log2 kernel)."""
    from ..functions.intmath import log2_fp_sql

    l2 = log2_fp_sql("d")
    return f"""
with e0 as ({edges_cte}),
e as (
  select distinct least(a, b) as a, greatest(a, b) as b
  from e0 where a is not null and b is not null and a <> b
),
adj as (
  select a as w, b as v from e union all select b as w, a as v from e
),
deg as (select w, count(*) as d from adj group by w),
wdeg as (
  select w, {AA_SCALE} // ({l2}) as aa_w
  from deg where d >= 2 and d <= {max_pivot_degree}
),
scored as (
  select l.v as x, r.v as y,
         cast(count(*) as bigint) as cn,
         cast(sum(wd.aa_w) as bigint) as aa_fp
  from adj l
  join adj r on l.w = r.w and l.v < r.v
  join wdeg wd on wd.w = l.w
  group by 1, 2
)
select x, y, cn, aa_fp
from scored s
where cn >= {min_cn}
  and not exists (select 1 from e where e.a = s.x and e.b = s.y)
"""


def khop_sample(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 2,
    fanout: int | None = None,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """k-hop neighborhood extraction with optional deterministic fanout
    sampling — the GraphSAGE / GraphRAG subgraph builder: expand BFS
    from ``seeds`` (a DataFrame with a ``node`` column) for ``k``
    rounds over the undirected graph, keeping per frontier node at most
    ``fanout`` expansion edges per round (``None`` = keep all). Returns
    the kept edges ``(hop, u, v)`` with ``hop`` in 1..k — the sampled
    subgraph GNN training or RAG context assembly consumes.

    Sampling is HASH-random (portable md5 of ``(u, v, hop)``, smallest
    ``fanout`` ranks kept, node id as the collision tie-break) — the
    same discipline as :func:`random_walks`: reproducible across runs,
    task retries, and engines, where any PRNG scheme is not. Edges
    into already-visited nodes are kept in the output (GraphSAGE keeps
    cross edges) but never re-expanded (BFS discipline: each node's
    neighborhood is sampled exactly once, at its first reach), so the
    output is bounded by Σ_r |frontier_r|·fanout regardless of graph
    size. Per round: one equi-join of the frontier against the
    persisted adjacency + one per-node top-``fanout`` window on
    frontier-sized data + an anti-join for the new frontier; lineage
    cut per round. Seeds absent from the graph simply expand nothing.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if fanout is not None and fanout < 1:
        raise ValueError(f"fanout must be >= 1 or None, got {fanout}")
    from pyspark.sql.window import Window

    e = (edges.select(F.col(src).cast("string").alias("a"),
                      F.col(dst).cast("string").alias("b"))
         .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                & (F.col("a") != F.col("b")))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .dropDuplicates())
    adj = (e.select(F.explode(F.array(
        F.struct(F.col("a").alias("w"), F.col("b").alias("v")),
        F.struct(F.col("b").alias("w"), F.col("a").alias("v")),
    )).alias("p")).select("p.w", "p.v")
        .persist())

    visited = round_checkpoint(
        seeds.select(F.col("node").cast("string").alias("node"))
        .dropDuplicates(), checkpoint_dir)
    frontier = visited
    kept_rounds = []
    try:
        for r in range(1, k + 1):
            cand = adj.join(
                frontier.select(F.col("node").alias("w")), "w")
            if fanout is not None:
                hk = portable_hash60(F.concat_ws(
                    "\x1f", F.lit("khop-v1"), F.col("w"), F.col("v"),
                    F.lit(str(r))))
                rn = F.row_number().over(
                    Window.partitionBy("w").orderBy(hk, F.col("v")))
                cand = (cand.withColumn("_rn", rn)
                        .where(F.col("_rn") <= fanout).drop("_rn"))
            kept = round_checkpoint(
                cand.select(F.lit(r).alias("hop"),
                            F.col("w").alias("u"), F.col("v")),
                checkpoint_dir)
            kept_rounds.append(kept)
            frontier = round_checkpoint(
                kept.select(F.col("v").alias("node")).dropDuplicates()
                .join(visited, "node", "left_anti"), checkpoint_dir)
            visited = round_checkpoint(
                visited.unionByName(frontier), checkpoint_dir)
    finally:
        adj.unpersist()
    out = kept_rounds[0]
    for kr in kept_rounds[1:]:
        out = out.unionByName(kr)
    return out


def khop_sample_py(edges, seed_nodes, k: int = 2, fanout: int | None = None):
    """Pure-Python twin of :func:`khop_sample`."""
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    e = {(a, b) if a < b else (b, a) for a, b in edges
         if a is not None and b is not None and a != b}
    adj: dict = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    visited = set(seed_nodes)
    frontier = set(seed_nodes)
    out = []
    for r in range(1, k + 1):
        nxt = set()
        for u in sorted(frontier):
            nbrs = sorted(adj.get(u, ()))
            if fanout is not None:
                nbrs.sort(key=lambda v: (
                    h60("\x1f".join(("khop-v1", u, v, str(r)))), v))
                nbrs = nbrs[:fanout]
            for v in nbrs:
                out.append((r, u, v))
                if v not in visited:
                    nxt.add(v)
        visited |= nxt
        frontier = nxt
    return out


def khop_sample_oracle_sql(edges_cte: str, seeds_cte: str, k: int = 2,
                           fanout: int | None = None) -> str:
    """DuckDB twin of :func:`khop_sample` — one unrolled CTE chain per
    round (multi-referenced tables MATERIALIZED, the DuckDB inlining
    trap). ``edges_cte`` yields (a, b); ``seeds_cte`` yields (node)."""
    from ..functions.hashing import portable_hash60_sql

    hk = portable_hash60_sql(
        "concat_ws(chr(31), 'khop-v1', w, v, cast({r} as varchar))")
    parts = [f"""
with e0 as ({edges_cte}),
e as (
  select distinct least(a, b) as a, greatest(a, b) as b
  from e0 where a is not null and b is not null and a <> b
),
adj as materialized (
  select a as w, b as v from e union all select b as w, a as v from e
),
v0 as materialized (
  select distinct cast(node as varchar) as node from ({seeds_cte})
),
f0 as materialized (select node from v0)"""]
    for r in range(1, k + 1):
        cand = (f"select a.w, a.v from adj a "
                f"join f{r - 1} f on a.w = f.node")
        if fanout is not None:
            kexpr = (f"select w, v from (select w, v, row_number() over "
                     f"(partition by w order by {hk.format(r=r)}, v) as rn "
                     f"from ({cand})) t where rn <= {fanout}")
        else:
            kexpr = cand
        parts.append(f"k{r} as materialized ({kexpr})")
        parts.append(
            f"f{r} as materialized (select distinct v as node from k{r} "
            f"where not exists (select 1 from v{r - 1} x "
            f"where x.node = k{r}.v))")
        parts.append(
            f"v{r} as materialized "
            f"(select node from v{r - 1} union select node from f{r})")
    sel = " union all ".join(
        f"select cast({r} as int) as hop, w as u, v from k{r}"
        for r in range(1, k + 1))
    return ",\n".join(parts) + "\n" + sel


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    local_threshold: int = 100_000,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Seed-restart (personalized) PageRank — relevance of every node
    TO a seed set, the ranking half of GraphRAG context assembly
    (:func:`khop_sample` extracts the neighborhood, this orders it):

        r'(v) = teleport(v) + d · Σ_in (r[u] // outdeg[u]) // DEN
        teleport(v) = ((1-d)·SCALE) // (DEN·|S|) if v ∈ S else 0

    with the same integer fixed-point discipline as :func:`pagerank`
    (associative sums, floor division, bit-exact cross-engine; the
    documented floor-remainder mass leak). Initial mass sits entirely
    on the seeds (``SCALE // |S|`` each). Seeds not present in the
    graph are ignored; an empty effective seed set fails loudly (the
    query is meaningless, and n=0 would divide by zero). Returns
    ``(node, rank_fp)`` — non-seed components score 0 by construction.

    Same per-round shape and ``local_threshold`` / ``checkpoint_dir``
    semantics as :func:`pagerank` (the sub-threshold local twin is
    bit-identical, pinned by pytest).
    """
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
         .distinct().persist())
    sd = seeds.select(F.col("node")).where(
        F.col("node").isNotNull()).distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    seed_nodes = nodes.join(sd, "node", "left_semi").persist()
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        for h in (e, nodes, seed_nodes):
            h.unpersist()
        raise ValueError(
            "personalized_pagerank: no seed appears in the graph")
    if local_threshold and e.count() <= local_threshold:
        seed_set = {r["node"] for r in seed_nodes.collect()}
        out = _ppr_local(e, seed_set, iterations)
        for h in (e, nodes, seed_nodes):
            h.unpersist()
        return out
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    teleport = ((DAMP_DEN - DAMP_NUM) * SCALE) // (DAMP_DEN * n_seeds)
    flagged = nodes.join(
        seed_nodes.withColumn("_t", F.lit(True)), "node", "left")
    tele_col = F.when(F.col("_t"), F.lit(teleport)).otherwise(0)
    init_col = F.when(F.col("_t"), F.lit(SCALE // n_seeds)).otherwise(0)
    flagged = flagged.select(
        "node", tele_col.cast("long").alias("tele")).persist()
    ranks = (nodes.join(
        seed_nodes.withColumn("_t", F.lit(True)), "node", "left")
        .select("node", init_col.cast("long").alias("rank_fp")))
    ranks = round_checkpoint(ranks, checkpoint_dir)
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select("dst", F.expr("rank_fp div outdeg").alias("c")))
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        ranks = (
            flagged.join(inflow.withColumnRenamed("dst", "node"),
                         "node", "left")
            .select(
                "node",
                (F.col("tele")
                 + F.expr(f"({DAMP_NUM} * coalesce(inflow, 0)) "
                          f"div {DAMP_DEN}")).cast("long").alias("rank_fp")))
        ranks = round_checkpoint(ranks, checkpoint_dir)
    for h in (e, nodes, seed_nodes, outdeg, flagged):
        h.unpersist()
    return ranks


def _ppr_local(e: DataFrame, seed_set: set, iterations: int) -> DataFrame:
    """Driver-side twin of the exact PPR recurrence."""
    rows = [(r["src"], r["dst"]) for r in e.collect()]
    nodes = sorted({u for u, _ in rows} | {v for _, v in rows})
    ns = len(seed_set)
    outdeg: dict = {}
    for u, _ in rows:
        outdeg[u] = outdeg.get(u, 0) + 1
    teleport = ((DAMP_DEN - DAMP_NUM) * SCALE) // (DAMP_DEN * ns)
    r = {v: (SCALE // ns if v in seed_set else 0) for v in nodes}
    for _ in range(iterations):
        inflow = {v: 0 for v in nodes}
        for u, v in rows:
            inflow[v] += r[u] // outdeg[u]
        r = {v: (teleport if v in seed_set else 0)
             + (DAMP_NUM * inflow[v]) // DAMP_DEN for v in nodes}
    id_type = e.schema["src"].dataType.simpleString()
    return e.sparkSession.createDataFrame(
        [(v, r[v]) for v in nodes], f"node {id_type}, rank_fp long")


def personalized_pagerank_oracle_sql(edges_cte: str, seeds_cte: str,
                                     iterations: int = 5) -> str:
    """DuckDB twin of :func:`personalized_pagerank` (unrolled rounds,
    identical integer recurrence). ``seeds_cte`` yields (node)."""
    sql = [f"with e as (select distinct src, dst from ({edges_cte})),"]
    sql.append("nodes as (select src as node from e union "
               "select dst as node from e),")
    sql.append(f"sd as (select distinct node from ({seeds_cte}) "
               "where node in (select node from nodes)),")
    sql.append("ns as (select count(*) as n from sd),")
    sql.append("outdeg as (select src, count(*) as outdeg from e "
               "group by src),")
    tele = (f"({(DAMP_DEN - DAMP_NUM) * SCALE} // "
            f"({DAMP_DEN} * (select n from ns)))")
    is_seed = "nodes.node in (select node from sd)"
    sql.append(
        f"r0 as (select node, case when {is_seed} then "
        f"{SCALE} // (select n from ns) else 0 end as rank_fp "
        "from nodes),")
    for i in range(iterations):
        prev, cur = f"r{i}", f"r{i + 1}"
        sql.append(
            f"inflow{i} as (select e.dst, "
            f"sum({prev}.rank_fp // outdeg.outdeg) as inflow "
            f"from e join {prev} on {prev}.node = e.src "
            "join outdeg on outdeg.src = e.src group by e.dst),")
        sql.append(
            f"{cur} as (select nodes.node, "
            f"(case when {is_seed} then {tele} else 0 end)"
            f" + ({DAMP_NUM} * coalesce(inflow{i}.inflow, 0)) // {DAMP_DEN}"
            " as rank_fp "
            f"from nodes left join inflow{i} on inflow{i}.dst = nodes.node),")
    body = "\n".join(sql).rstrip(",")
    return f"{body}\nselect node, cast(rank_fp as bigint) as rank_fp " \
           f"from r{iterations}"


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient — the localized form of
    :func:`triangle_count` (how clique-like each entity's neighborhood
    is; low-LCC high-degree nodes are the hub/bridge entities that
    salting and linking priors care about). Returns
    ``(node, degree, n_tri, lcc_fp)`` for every node, with
    ``lcc_fp = (2·n_tri·SCALE) // (d·(d−1))`` in fixed point (0 when
    d < 2 — an isolated-ish node has no defined neighborhood density;
    the integer division keeps the oracle bit-exact).

    Same degree-ordered wedge bound as the census (oriented out-degree
    O(√m), wedges ≤ m^1.5): each triangle is found exactly once at its
    lowest-(degree, id) pivot, then attributed to all THREE members by
    one explode — a join against the closing edge instead of the
    census's semi-join, everything else identical. Four shuffles on
    edge-shaped data.
    """
    e = (edges.select(F.col("src").cast("string").alias("a"),
                      F.col("dst").cast("string").alias("b"))
         .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                & (F.col("a") != F.col("b")))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .dropDuplicates()
         .persist())
    deg = (e.select(F.explode(F.array("a", "b")).alias("v"))
           .groupBy("v").agg(F.count("*").alias("d")))
    ranked = (
        e.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")),
               "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")),
              "b"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = ranked.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("w"))
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    tri = (
        o1.join(o2, F.col("o1.u") == F.col("o2.u"))
        .where(F.col("o1.w") < F.col("o2.w"))
        .select(F.col("o1.u").alias("u"), F.col("o1.w").alias("x"),
                F.col("o2.w").alias("y"))
        .join(e, (F.col("x") == e["a"]) & (F.col("y") == e["b"]),
              "left_semi"))
    per_node = (tri.select(F.explode(F.array("u", "x", "y")).alias("v"))
                .groupBy("v").agg(F.count("*").alias("n_tri")))
    out = (deg.join(per_node, "v", "left")
           .select(F.col("v").alias("node"),
                   F.col("d").alias("degree"),
                   F.coalesce("n_tri", F.lit(0)).cast("long")
                   .alias("n_tri"))
           .withColumn(
               "lcc_fp",
               F.when(F.col("degree") >= 2,
                      F.expr(f"(2 * n_tri * {SCALE}) div "
                             "(degree * (degree - 1))"))
               .otherwise(0).cast("long")))
    out._cow_persisted = (e,)  # type: ignore[attr-defined]
    return out


def clustering_coefficient_py(edges):
    """Pure-Python twin of :func:`clustering_coefficient`."""
    e = {(a, b) if a < b else (b, a) for a, b in edges
         if a is not None and b is not None and a != b}
    adj: dict = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v, nbrs in adj.items():
        d = len(nbrs)
        ns = sorted(nbrs)
        t = sum(1 for i in range(len(ns)) for j in range(i + 1, len(ns))
                if (min(ns[i], ns[j]), max(ns[i], ns[j])) in e)
        lcc = (2 * t * SCALE) // (d * (d - 1)) if d >= 2 else 0
        out[v] = (d, t, lcc)
    return out


def clustering_coefficient_oracle_sql(edges_cte: str) -> str:
    """DuckDB twin of :func:`clustering_coefficient` (enumeration by
    canonical a<b<c joins — each triangle once, then 3 member rows)."""
    return f"""
with e0 as ({edges_cte}),
e as (
  select distinct least(a, b) as a, greatest(a, b) as b
  from e0 where a is not null and b is not null and a <> b
),
deg as (
  select v, count(*) as d from (
    select a as v from e union all select b as v from e) t group by v
),
tri as (
  select e1.a as x, e1.b as y, e2.b as z
  from e e1
  join e e2 on e2.a = e1.a and e2.b > e1.b
  join e e3 on e3.a = e1.b and e3.b = e2.b
),
per_node as (
  select v, cast(count(*) as bigint) as n_tri from (
    select x as v from tri union all select y from tri
    union all select z from tri) t
  group by v
)
select deg.v as node, cast(deg.d as bigint) as degree,
       coalesce(per_node.n_tri, 0) as n_tri,
       cast(case when deg.d >= 2
            then (2 * coalesce(per_node.n_tri, 0) * {SCALE})
                 // (deg.d * (deg.d - 1))
            else 0 end as bigint) as lcc_fp
from deg left join per_node on per_node.v = deg.v
"""


def node2vec_walks(
    edges: DataFrame,
    walk_len: int = 5,
    walks_per_node: int = 1,
    w_return: int = 250,
    w_common: int = 1000,
    w_far: int = 500,
    src: str = "src",
    dst: str = "dst",
    salt: str = WALK_SALT,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """node2vec second-order biased walks — :func:`random_walks` with
    the Grover–Leskovec return/in-out bias: from ``cur`` with previous
    node ``prev``, neighbor ``w`` draws integer weight

      ``w_return`` if w == prev        (distance 0 — 1/p in the paper)
      ``w_common`` if w ~ prev         (distance 1 — the BFS-ish pull)
      ``w_far``    otherwise           (distance 2 — 1/q, DFS-ish)

    Weights are INTEGERS by contract (``w_return = W/p`` for rational
    p; the defaults encode p=4, q=2) so the cumulative-sum draw —
    ``md5(walk_id, t, salt) mod Σweights`` against dst-ordered running
    totals — is engine-exact; floats would put the draw boundary on an
    ulp. Step 1 has no ``prev`` and is uniform (exactly DeepWalk).

    Per step: one equi-join of the frontier against the persisted
    adjacency (frontier×avg-degree candidate rows), one hash join
    against the bidirectional edge set for the distance-1 flag, one
    per-walk window cumsum — all bounded by Σ deg(cur) per step.
    Lineage cut per step. Returns ``(walk_id, step, node)``.
    """
    if walk_len < 1 or walks_per_node < 1:
        raise ValueError("walk_len and walks_per_node must be >= 1")
    for name, w in (("w_return", w_return), ("w_common", w_common),
                    ("w_far", w_far)):
        if not isinstance(w, int) or w < 1:
            raise ValueError(f"{name} must be an integer >= 1, got {w!r}")
    from pyspark.sql import Window

    e = (edges.select(F.col(src).cast("string").alias("a"),
                      F.col(dst).cast("string").alias("b"))
         .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                & (F.col("a") != F.col("b")))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .dropDuplicates())
    bidir = (e.select(F.explode(F.array(
        F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
        F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
    )).alias("p")).select("p.u", "p.v").persist())
    nbr = bidir.select(
        "u", "v",
        (F.row_number().over(
            Window.partitionBy("u").orderBy("v")) - 1).alias("idx"),
    ).persist()
    deg = nbr.groupBy("u").agg(F.count("*").alias("deg")).persist()

    frontier = (
        deg.select("u").crossJoin(
            edges.sparkSession.range(walks_per_node)
            .select(F.col("id").alias("w")))
        .select(F.concat(F.col("u"), F.lit("#"),
                         F.col("w").cast("string")).alias("walk_id"),
                F.col("u").alias("cur")))
    paths = [frontier.select("walk_id", F.lit(0).alias("step"),
                             F.col("cur").alias("node"))]
    # step 1: uniform (no prev), identical to random_walks
    pick1 = (frontier.join(deg.withColumnRenamed("u", "cur"), "cur")
             .select("walk_id", "cur",
                     (portable_hash60(F.concat_ws(
                         "\x1f", F.col("walk_id"), F.lit("1"),
                         F.lit(salt))) % F.col("deg")).alias("idx")))
    state = (pick1.join(nbr.withColumnRenamed("u", "cur"),
                        ["cur", "idx"])
             .select("walk_id", F.col("v").alias("cur"),
                     F.col("cur").alias("prev")))
    state = round_checkpoint(state, checkpoint_dir)
    paths.append(state.select("walk_id", F.lit(1).alias("step"),
                              F.col("cur").alias("node")))
    flag = bidir.select(F.col("u").alias("prev"), F.col("v"),
                        F.lit(True).alias("_adj"))
    w_walk = Window.partitionBy("walk_id")
    w_cum = w_walk.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    for t in range(2, walk_len + 1):
        cand = (state.join(nbr.withColumnRenamed("u", "cur"), "cur")
                .join(flag, ["prev", "v"], "left")
                .withColumn(
                    "wt",
                    F.when(F.col("v") == F.col("prev"), w_return)
                    .when(F.coalesce("_adj", F.lit(False)), w_common)
                    .otherwise(w_far).cast("long")))
        drawn = (cand
                 .withColumn("cum", F.sum("wt").over(w_cum))
                 .withColumn("tot", F.sum("wt").over(w_walk))
                 .withColumn("r", portable_hash60(F.concat_ws(
                     "\x1f", F.col("walk_id"), F.lit(str(t)),
                     F.lit(salt))) % F.col("tot"))
                 .where((F.col("r") < F.col("cum"))
                        & (F.col("r") >= F.col("cum") - F.col("wt"))))
        state = round_checkpoint(
            drawn.select("walk_id", F.col("v").alias("cur"),
                         F.col("cur").alias("prev")), checkpoint_dir)
        paths.append(state.select("walk_id", F.lit(t).alias("step"),
                                  F.col("cur").alias("node")))
    result = paths[0]
    for p in paths[1:]:
        result = result.unionByName(p)
    result = result.localCheckpoint()
    for h in (bidir, nbr, deg):
        h.unpersist()
    return result


def node2vec_walks_py(edges, walk_len=5, walks_per_node=1,
                      w_return=250, w_common=1000, w_far=500,
                      salt=WALK_SALT):
    """Pure-Python twin of :func:`node2vec_walks`."""
    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    e = {(a, b) if a < b else (b, a) for a, b in edges
         if a is not None and b is not None and a != b}
    adj: dict = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = []
    for u in sorted(adj):
        for i in range(walks_per_node):
            wid = f"{u}#{i}"
            cur, prev = u, None
            out.append((wid, 0, cur))
            for t in range(1, walk_len + 1):
                ns = sorted(adj[cur])
                if t == 1:
                    nxt = ns[h60("\x1f".join((wid, "1", salt)))
                             % len(ns)]
                else:
                    wts = [w_return if v == prev
                           else w_common if v in adj.get(prev, ())
                           else w_far for v in ns]
                    r = h60("\x1f".join((wid, str(t), salt))) % sum(wts)
                    cum = 0
                    for v, w in zip(ns, wts):
                        cum += w
                        if r < cum:
                            nxt = v
                            break
                out.append((wid, t, nxt))
                cur, prev = nxt, cur
    return out


def node2vec_walks_oracle_sql(edges_cte: str, walk_len: int,
                              walks_per_node: int = 1,
                              w_return: int = 250, w_common: int = 1000,
                              w_far: int = 500,
                              salt: str = WALK_SALT) -> str:
    """DuckDB twin of :func:`node2vec_walks` (one unrolled CTE chain
    per step: candidates → distance classification → dst-ordered
    cumulative draw; multi-referenced tables MATERIALIZED)."""
    h = (f"cast(concat('0x', substr(md5(walk_id || chr(31) || '{{t}}' "
         f"|| chr(31) || '{salt}'), 1, 15)) as bigint)")
    sql = [
        f"with base as ({edges_cte}),",
        "e as materialized (select distinct least(a, b) as a, "
        "greatest(a, b) as b from base "
        "where a is not null and b is not null and a <> b),",
        "bidir as materialized (select a as u, b as v from e "
        "union all select b as u, a as v from e),",
        "nbr as materialized (select u, v, "
        "row_number() over (partition by u order by v) - 1 as idx "
        "from bidir),",
        "deg as materialized (select u, count(*) as deg from nbr "
        "group by u),",
        "s0 as materialized (select u || '#' || cast(i as varchar) "
        "as walk_id, u as cur from deg cross join "
        f"(select unnest(range({walks_per_node})) as i)),",
        # step 1: uniform
        "s1 as materialized (select s0.walk_id, nbr.v as cur, "
        "s0.cur as prev from s0 join deg on deg.u = s0.cur "
        "join nbr on nbr.u = s0.cur and nbr.idx = "
        f"({h.format(t=1)}) % deg.deg),",
    ]
    for t in range(2, walk_len + 1):
        p, c = f"s{t - 1}", f"s{t}"
        draw = h.format(t=t)
        sql.append(f"""
c{t} as materialized (
  select {p}.walk_id, {p}.cur, {p}.prev, nbr.v,
         case when nbr.v = {p}.prev then {w_return}
              when exists (select 1 from bidir b
                           where b.u = {p}.prev and b.v = nbr.v)
              then {w_common} else {w_far} end as wt
  from {p} join nbr on nbr.u = {p}.cur
),
{c} as materialized (
  select walk_id, v as cur, cur as prev from (
    select walk_id, cur, v, wt,
           sum(wt) over (partition by walk_id order by v
                         rows between unbounded preceding
                         and current row) as cum,
           sum(wt) over (partition by walk_id) as tot
    from c{t}) d
  where ({draw}) % tot < cum and ({draw}) % tot >= cum - wt
),""")
    steps = ["select walk_id, 0 as step, cur as node from s0"]
    steps += [f"select walk_id, {t} as step, cur as node from s{t}"
              for t in range(1, walk_len + 1)]
    body = "\n".join(sql).rstrip(",")
    return body + "\n" + "\nunion all\n".join(steps)


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Multi-source BFS hop distance: ``(node, dist)`` for every node
    reachable from ``seeds`` (a DataFrame with a ``node`` column) within
    ``max_hops`` undirected hops; seeds themselves at dist 0. The KG
    neighborhood-radius primitive (entity proximity for RAG context
    ranking, blast-radius analysis for canonicalization merges) the
    hop-labeled :func:`khop_sample` subgraph does not give you — khop
    keeps sampled *edges* per round, this assigns every reached node its
    *minimum* distance exactly.

    BFS layering makes min-dist free: a node joins the frontier in
    round r iff its distance IS r (the anti-join against the dist table
    guarantees first-reach wins), so no per-node min aggregation is ever
    re-run over the full reach set. Per round: one frontier×adjacency
    equi-join + dedup + one anti-join — all frontier-sized; the full
    edge list is scanned only through the persisted adjacency. Lineage
    cut per round (:func:`~cow_spark.operators.canon.round_checkpoint`);
    the per-round emptiness check is one count on frontier-sized data
    and stops the loop as soon as the reachable set is exhausted, so
    ``max_hops`` is a cap, not a fixed cost. Directed variant: pass a
    pre-oriented edge list and set ``symmetric=False`` upstream by
    giving ``edges`` already-symmetrized pairs — this function always
    treats pairs as undirected (the mention-graph convention shared
    with canon.py).

    No reference counterpart (COW has no graph ops); extension family
    SURVEY.md §2.9.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    e = (edges.select(F.col(src).cast("string").alias("a"),
                      F.col(dst).cast("string").alias("b"))
         .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                & (F.col("a") != F.col("b")))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .dropDuplicates())
    adj = (e.select(F.explode(F.array(
        F.struct(F.col("a").alias("w"), F.col("b").alias("v")),
        F.struct(F.col("b").alias("w"), F.col("a").alias("v")),
    )).alias("p")).select("p.w", "p.v")
        .persist())

    dist = round_checkpoint(
        seeds.select(F.col("node").cast("string").alias("node"))
        .dropDuplicates()
        .withColumn("dist", F.lit(0)), checkpoint_dir)
    frontier = dist.select("node")
    try:
        for r in range(1, max_hops + 1):
            reached = (adj.join(
                frontier.select(F.col("node").alias("w")), "w")
                .select(F.col("v").alias("node")).dropDuplicates())
            new = round_checkpoint(
                reached.join(dist.select("node"), "node", "left_anti")
                .withColumn("dist", F.lit(r)), checkpoint_dir)
            if new.isEmpty():
                break
            dist = round_checkpoint(
                dist.unionByName(new), checkpoint_dir)
            frontier = new.select("node")
    finally:
        adj.unpersist()
    return dist


def shortest_paths_py(edges, seed_nodes, max_hops: int = 6):
    """Pure-Python twin of :func:`shortest_paths`."""
    e = {(a, b) if a < b else (b, a) for a, b in edges
         if a is not None and b is not None and a != b}
    adj: dict = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {n: 0 for n in seed_nodes}
    frontier = set(seed_nodes)
    for r in range(1, max_hops + 1):
        nxt = {v for u in frontier for v in adj.get(u, ())
               if v not in dist}
        if not nxt:
            break
        for v in nxt:
            dist[v] = r
        frontier = nxt
    return sorted(dist.items())


def shortest_paths_oracle_sql(edges_cte: str, seeds_cte: str,
                              max_hops: int = 6) -> str:
    """DuckDB twin of :func:`shortest_paths` — unrolled frontier CTEs,
    one per hop (multi-referenced tables MATERIALIZED, the DuckDB
    inlining trap). ``edges_cte`` yields (a, b); ``seeds_cte`` yields
    (node). The unroll runs all ``max_hops`` rounds (late frontiers are
    just empty), so it matches the engine's early-exit output exactly."""
    parts = [f"""
with e0 as ({edges_cte}),
e as (
  select distinct least(a, b) as a, greatest(a, b) as b
  from e0 where a is not null and b is not null and a <> b
),
adj as materialized (
  select a as w, b as v from e union all select b as w, a as v from e
),
d0 as materialized (
  select distinct cast(node as varchar) as node, 0 as dist
  from ({seeds_cte})
),
f0 as materialized (select node from d0)"""]
    for r in range(1, max_hops + 1):
        parts.append(f"""f{r} as materialized (
  select distinct a.v as node from adj a
  join f{r - 1} f on a.w = f.node
  where not exists (select 1 from d{r - 1} d where d.node = a.v)
)""")
        parts.append(f"""d{r} as materialized (
  select node, dist from d{r - 1}
  union all
  select node, {r} as dist from f{r}
)""")
    return (",\n".join(parts)
            + f"\nselect node, cast(dist as int) as dist from d{max_hops}")


def hyperball(
    edges: DataFrame,
    rounds: int = 3,
    b: int = 4,
    src: str = "src",
    dst: str = "dst",
    salt: str | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): the per-node neighborhood
    function — ``(node, radius, s_fp, est)`` estimating ``|ball(node,
    radius)|`` for every radius 0..``rounds`` over the undirected graph
    — via register-propagated HyperLogLog sketches.

    Why this instead of per-node BFS: exact per-node ball sizes need
    |V| BFS traversals (the all-pairs problem — dead at any scale),
    while HyperBall keeps ONE register row set of at most |V|·m rows
    and refines every node's sketch simultaneously: round t replaces
    each node's registers with the register-wise max of its own and its
    neighbors' (``hll_merge``), which makes regs_t(v) EXACTLY the HLL
    sketch of ball(v, t) — merge(sketch(A), sketch(B)) == sketch(A∪B)
    is lossless, so the estimates are bit-identical to sketching each
    ball directly (pinned by the python twin). Neighborhood functions /
    effective-diameter / closeness centrality at 100 TB all read off
    this table.

    Scale shape per round: one adjacency equi-join of the register
    table (≤ |V|·m rows, m = 2^b) + one partial-aggregated max groupBy
    — shuffle bounded by |V|·m whatever the edge count; per-round
    lineage cut. Everything rides the portable md5 HLL
    (:mod:`cow_spark.functions.sketch`), so a DuckDB replay reproduces
    every register and estimate column bit-for-bit.

    No reference counterpart (COW has no graph ops); extension family
    SURVEY.md §2.9.
    """
    from ..functions.sketch import (HLL_SALT, hll_estimate, hll_merge,
                                    hll_registers)

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if salt is None:
        salt = HLL_SALT
    e = symmetrize(
        edges.select(F.col(src).cast("string").alias("src"),
                     F.col(dst).cast("string").alias("dst")))
    adj = e.select(F.col("src").alias("w"), F.col("dst").alias("v")).persist()
    nodes = adj.select(F.col("w").alias("node")).dropDuplicates()
    regs = round_checkpoint(
        hll_registers(nodes, "node", ("node",), b=b, salt=salt),
        checkpoint_dir)

    def _est(r: int, t: DataFrame) -> DataFrame:
        return hll_estimate(t, ("node",), b=b).select(
            "node", F.lit(r).cast("int").alias("radius"), "s_fp", "est")

    out = _est(0, regs)
    try:
        for t in range(1, rounds + 1):
            nbr = (adj.join(regs.withColumnRenamed("node", "w"), "w")
                   .select(F.col("v").alias("node"), "bucket", "r"))
            regs = round_checkpoint(
                hll_merge(regs.unionByName(nbr), ("node",)),
                checkpoint_dir)
            out = out.unionByName(_est(t, regs))
        # force the per-round estimates while adj is alive (checkpointed
        # regs keep them valid afterwards)
        out = round_checkpoint(out, checkpoint_dir)
    finally:
        adj.unpersist()
    return out


def hyperball_closeness(nf: DataFrame) -> DataFrame:
    """Collapse a :func:`hyperball` table to per-node centrality
    ingredients: ``(node, n_reached, sum_dist)`` with ``n_reached`` the
    ball estimate at the largest radius and ``sum_dist = Σ_t t ·
    (est_t − est_{t−1})`` (closeness = (n_reached−1)/sum_dist in the
    caller's preferred float convention; kept integer here so the twin
    is exact). One window sort over ≤ rounds+1 rows per node."""
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy("radius")
    delta = F.col("est") - F.lag("est", 1, 0).over(w)
    step = (F.when(F.col("radius") > 0, F.col("radius") * delta)
            .otherwise(F.lit(0)))
    return (nf.select("node", "radius", "est", step.alias("_s"))
            .groupBy("node")
            .agg(F.max_by("est", "radius").alias("n_reached"),
                 F.sum("_s").alias("sum_dist")))


def hyperball_py(edges, rounds: int = 3, b: int = 4,
                 salt: str | None = None):
    """Pure-Python twin of :func:`hyperball` — sketches each exact BFS
    ball directly (the lossless-merge property under test)."""
    from ..functions.sketch import HLL_SALT, hll_estimate_py, hll_py

    if salt is None:
        salt = HLL_SALT
    adj: dict = {}
    for a, c in edges:
        if a is None or c is None or a == c:
            continue
        a, c = str(a), str(c)
        adj.setdefault(a, set()).add(c)
        adj.setdefault(c, set()).add(a)
    rows = []
    for node in adj:
        ball = {node}
        frontier = {node}
        for r in range(rounds + 1):
            if r:
                frontier = {v for u in frontier for v in adj[u]} - ball
                ball |= frontier
            est = hll_estimate_py(hll_py(sorted(ball), b=b, salt=salt),
                                  b=b)
            rows.append((node, r, est["s_fp"], est["est"]))
    return sorted(rows)


def hyperball_oracle_sql(edges_cte: str, rounds: int = 3, b: int = 4,
                         salt: str | None = None) -> str:
    """DuckDB twin of :func:`hyperball`: unrolled register-propagation
    rounds (MATERIALIZED — the inlining trap), one estimate block per
    radius, identical md5 hash and estimator arithmetic as
    ``_sql_hll_profile``. ``edges_cte`` yields (a, b)."""
    from ..functions.intmath import log2_fp_sql
    from ..functions.sketch import HLL_SALT, LN2_FP, S_BITS, _alpha

    if salt is None:
        salt = HLL_SALT
    m = 1 << b
    w1 = 60 - b + 1
    c_raw = repr(_alpha(m) * (m * m) * float(2 ** S_BITS))
    pow2 = "[" + ", ".join(str(2 ** i) for i in range(S_BITS + 1)) + "]"
    lin_num = (f"({m} * ({b << 10} - "
               f"{log2_fp_sql(f'{m} - n_regs')}) * {LN2_FP})")
    parts = [f"""
with e0 as ({edges_cte}),
es as (
  select a as src, b as dst from e0 union all select b, a from e0
),
e as materialized (
  select distinct cast(src as varchar) as w, cast(dst as varchar) as v
  from es where src is not null and dst is not null and src <> dst
),
n as (select distinct w as node from e),
r0 as materialized (
  select node,
         h % {m} as bucket,
         case when h // {m} = 0 then {w1}
              else {w1} - length(bin(h // {m})) end as r
  from (
    select node,
           cast(concat('0x', substr(md5(concat_ws(chr(31), node,
                '{salt}')), 1, 15)) as bigint) as h
    from n
  )
)"""]
    for t in range(1, rounds + 1):
        parts.append(f"""r{t} as materialized (
  select node, bucket, max(r) as r from (
    select node, bucket, r from r{t - 1}
    union all
    select e.v as node, p.bucket, p.r
    from e join r{t - 1} p on p.node = e.w
  ) group by node, bucket
)""")
    for t in range(rounds + 1):
        parts.append(f"""a{t} as (
  select node, cast(count(*) as int) as n_regs,
         cast(sum(case when r <= {S_BITS}
              then ({pow2})[{S_BITS + 1} - r] else 0 end) as bigint)
           as s_used
  from r{t} group by node
),
x{t} as (
  select node, {t} as radius, n_regs,
         s_used + cast({m} - n_regs as bigint) * {2 ** S_BITS} as s_fp,
         case when s_used + cast({m} - n_regs as bigint) * {2 ** S_BITS}
                   > 0
              then cast(floor({c_raw} / (s_used +
                   cast({m} - n_regs as bigint) * {2 ** S_BITS}))
                   as bigint) end as est_raw,
         case when {m} - n_regs >= 1
              then cast({lin_num} // {1024 * 1_000_000} as bigint)
         end as est_linear
  from a{t}
)""")
    sel = "\nunion all\n".join(
        f"""select node, cast(radius as int) as radius, s_fp,
       cast(case when {1 << b} - n_regs > 0
                  and est_raw < {(5 * (1 << b)) // 2}
            then est_linear else est_raw end as bigint) as est
from x{t}""" for t in range(rounds + 1))
    return ",\n".join(parts) + "\n" + sel


def scc(
    edges: DataFrame,
    max_iter: int = 20,
    local_threshold: int = 2_000,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Strongly connected components of a DIRECTED edge list:
    ``(node, scc)`` with scc = min(v, min{u : v→*u and u→*v}) — the
    component id every member agrees on, because mutual reachability
    is an equivalence and min is order-consistent.

    Built on :func:`canon.transitive_pairs` (path doubling, log-depth
    rounds; sub-threshold graphs close driver-side): one closure, one
    self-join of the pair table against its swap (mutual pairs), one
    min-aggregate. Self-pairs never appear in the closure, so
    singleton SCCs fall out of the coalesce, not a special case.

    Scale honesty, same contract as transitive_pairs: the closure's
    pair table is the bound. Right for workflow/tool-transition
    graphs, schema hierarchies, and agent state machines (cycles small,
    reach bounded); wrong for social-graph density — there you want
    the FW-BW/trim algorithm, which trades pair tables for O(diameter)
    label rounds per pivot batch.
    """
    from .canon import transitive_pairs

    e = (edges.select("src", "dst")
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull()
                & (F.col("src") != F.col("dst")))
         .dropDuplicates())
    pairs = transitive_pairs(e, max_iter=max_iter,
                             checkpoint_dir=checkpoint_dir,
                             local_threshold=local_threshold)
    swapped = pairs.select(F.col("dst").alias("src"),
                           F.col("src").alias("dst"))
    mutual = pairs.join(swapped, ["src", "dst"], "left_semi")
    mins = mutual.groupBy("src").agg(F.min("dst").alias("mate_min"))
    nodes = (e.select(F.explode(F.array("src", "dst")).alias("node"))
             .dropDuplicates())
    return (nodes.join(mins, nodes["node"] == mins["src"], "left")
            .select("node",
                    F.least(F.col("node"),
                            F.coalesce(F.col("mate_min"), F.col("node")))
                    .alias("scc")))


def scc_py(edges) -> list:
    """Exact serial twin: closure by DFS per node, same min rule."""
    adj: dict = {}
    nodes = set()
    for a, b in edges:
        if a == b:
            continue
        nodes.update((a, b))
        adj.setdefault(a, set()).add(b)
    reach = {}
    for v in nodes:
        seen: set = set()
        stack = list(adj.get(v, ()))
        while stack:
            u = stack.pop()
            if u in seen:
                continue
            seen.add(u)
            stack.extend(adj.get(u, ()))
        reach[v] = seen
    out = []
    for v in sorted(nodes):
        mates = [u for u in reach[v] if u != v and v in reach.get(u, ())]
        out.append((v, min([v] + mates)))
    return out


def scc_oracle_sql(edges_cte: str) -> str:
    """DuckDB twin: recursive-CTE closure + mutual-pair min."""
    return f"""
with recursive base as ({edges_cte}),
e as (select distinct src, dst from base
      where src is not null and dst is not null and src <> dst),
r(src, dst) as (
  select src, dst from e
  union
  select r.src, e.dst from r join e on e.src = r.dst
  where e.dst <> r.src
),
nodes as (select distinct v as node from
          (select src as v from e union all select dst as v from e)),
mutual as (
  select a.src as v, min(a.dst) as m
  from r a join r b on b.src = a.dst and b.dst = a.src
  group by a.src
)
select n.node as node, least(n.node, coalesce(m.m, n.node)) as scc
from nodes n left join mutual m on m.v = n.node
"""


def scc_fwbw(
    edges: DataFrame,
    max_outer: int = 8,
    max_rounds: int = 64,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Strongly connected components for DENSE directed graphs —
    trim + forward-coloring + backward sweep (the FW-BW family:
    Fleischer-Hendrickson-Pinar divide-and-conquer, run here in the
    Orzan coloring form so every color class peels in the same round).
    Same output contract as :func:`scc`: ``(node, scc)`` with
    scc = min member of the component.

    Where :func:`scc` materializes the reachability closure (right for
    workflow/tool graphs whose reach sets are small, wrong for a
    social-density graph where the closure is Θ(n²) pairs), this
    variant never builds a pair table — every intermediate is node- or
    edge-sized:

    1. **Trim**: nodes with zero in- or out-degree in the active
       subgraph are singleton SCCs; peel them iteratively (two distinct
       projections + two semi-joins per round). Kills the acyclic
       fringe that dominates real crawl/mention graphs.
    2. **Color** (forward sweep): propagate ``color(v) = min{u : u
       reaches v, u active}`` to fixpoint — one edge join + one
       min-aggregate per round, O(active diameter) rounds. The fixpoint
       check counts improved rows, so a converged class costs nothing
       extra.
    3. **Extract** (backward sweep): a root is a node with
       ``color(v) == v`` — by min-consistency the root is the smallest
       member of its SCC, and SCC(root) is exactly the set
       backward-reachable from the root *within its color class*
       (intermediate nodes of any path from a class member to the root
       provably share the color). BFS over reversed edges restricted to
       the class: frontier-sized joins, first-reach-wins anti-join.
    4. Remove every extracted SCC (at least the class of the global
       minimum resolves per outer round — termination ≤ #SCCs, in
       practice 1-3 outer rounds after trim), repeat.

    ``max_outer``/``max_rounds`` are fail-loud convergence bounds, not
    silent truncations. Per-round lineage cuts via
    :func:`~cow_spark.operators.canon.round_checkpoint`; the active
    edge table is persisted per outer round and released in a finally.

    No reference counterpart (COW has no graph ops); extension family
    SURVEY.md §2.11.
    """
    e_all = (edges.select(src, dst)
             .where(F.col(src).isNotNull() & F.col(dst).isNotNull()
                    & (F.col(src) != F.col(dst)))
             .dropDuplicates())
    nodes = (e_all.select(F.explode(F.array(src, dst)).alias("node"))
             .dropDuplicates())

    done: DataFrame | None = None

    def _accumulate(acc, part):
        part = part.select("node", "scc")
        return part if acc is None else acc.unionByName(part)

    active_n = round_checkpoint(nodes, checkpoint_dir)
    active_e = round_checkpoint(e_all, checkpoint_dir)
    for _ in range(max_outer):
        if active_n.isEmpty():
            break
        # ---- 1. trim the acyclic fringe (zero in- or out-degree) ----
        for _ in range(max_rounds):
            has_out = active_e.select(F.col(src).alias("node")).dropDuplicates()
            has_in = active_e.select(F.col(dst).alias("node")).dropDuplicates()
            keep = (active_n.join(has_out, "node", "left_semi")
                    .join(has_in, "node", "left_semi"))
            keep = round_checkpoint(keep, checkpoint_dir)
            trimmed = active_n.join(keep, "node", "left_anti")
            if trimmed.isEmpty():
                break
            done = _accumulate(
                done, trimmed.select("node", F.col("node").alias("scc")))
            active_n = keep
            active_e = round_checkpoint(
                active_e
                .join(keep.select(F.col("node").alias(src)), src, "left_semi")
                .join(keep.select(F.col("node").alias(dst)), dst, "left_semi"),
                checkpoint_dir)
        if active_n.isEmpty():
            break
        ep = active_e.persist()
        try:
            # ---- 2. forward min-coloring to fixpoint ----
            col = round_checkpoint(
                active_n.select("node", F.col("node").alias("color")),
                checkpoint_dir)
            converged = False
            for _ in range(max_rounds):
                # fold the improved-rows probe into the color update
                # (carry the pre-round color; convergence is a scan of
                # the just-checkpointed frame — the old shape paid a
                # separate better-join + checkpoint per round)
                prop = (ep.join(col.select(F.col("node").alias(src),
                                           "color"), src)
                        .groupBy(F.col(dst).alias("node"))
                        .agg(F.min("color").alias("c2")))
                upd = round_checkpoint(
                    col.join(prop, "node", "left")
                    .select("node",
                            F.col("color").alias("prev"),
                            F.least("color", "c2").alias("color")),
                    checkpoint_dir)
                changed = (upd.where(F.col("color") != F.col("prev"))
                           .limit(1).count())
                col = upd.select("node", "color")
                if changed == 0:
                    converged = True
                    break
            if not converged:
                raise RuntimeError(
                    f"scc_fwbw coloring did not converge in {max_rounds} "
                    "rounds — raise max_rounds (active diameter exceeds "
                    "the bound)")
            # ---- 3. backward BFS from roots within each color class ----
            members = round_checkpoint(
                col.where(F.col("color") == F.col("node"))
                .select("node", F.col("node").alias("scc")),
                checkpoint_dir)
            frontier = members
            for _ in range(max_rounds):
                step = (ep.join(frontier.select(F.col("node").alias(dst),
                                                "scc"), dst)
                        .select(F.col(src).alias("node"), "scc")
                        .dropDuplicates()
                        .join(col, "node")
                        .where(F.col("color") == F.col("scc"))
                        .select("node", "scc"))
                new = round_checkpoint(
                    step.join(members.select("node"), "node", "left_anti"),
                    checkpoint_dir)
                if new.isEmpty():
                    break
                members = round_checkpoint(
                    members.unionByName(new), checkpoint_dir)
                frontier = new
            else:
                raise RuntimeError(
                    f"scc_fwbw backward sweep did not finish in "
                    f"{max_rounds} rounds — raise max_rounds")
            done = _accumulate(done, members)
            # ---- 4. peel the resolved classes ----
            active_n = round_checkpoint(
                active_n.join(members.select("node"), "node", "left_anti"),
                checkpoint_dir)
            active_e = round_checkpoint(
                active_e
                .join(active_n.select(F.col("node").alias(src)),
                      src, "left_semi")
                .join(active_n.select(F.col("node").alias(dst)),
                      dst, "left_semi"),
                checkpoint_dir)
        finally:
            ep.unpersist()
    else:
        if not active_n.isEmpty():
            raise RuntimeError(
                f"scc_fwbw did not resolve every component in {max_outer} "
                "outer rounds — raise max_outer (long SCC condensation "
                "chains need one round per chain link)")
    if done is None:
        spark = edges.sparkSession
        schema = nodes.select(
            "node", F.col("node").alias("scc")).schema
        return spark.createDataFrame([], schema)
    return done


def ktruss(
    edges: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """k-truss decomposition by support peeling: the maximal subgraph
    of the undirected simple graph in which every EDGE sits in at
    least ``k - 2`` triangles. Returns ``(a, b, kept)`` for every
    canonical (a < b) edge — kept = 1 inside the truss. The
    edge-grained sibling of :func:`kcore`: cores screen node density,
    trusses screen cohesion (an edge with no triangle support is a
    bridge, not community fabric) — the standard cleanup before
    clique-ish community mining on entity graphs.

    Per round: triangle ENUMERATION (not just counting) with the same
    degree-ordered orientation as :func:`triangle_count` — oriented
    out-degree is O(√m), so wedge candidates are bounded by m^1.5 —
    then each triangle charges its three canonical edges, one groupBy
    sums support, and edges below k-2 drop. Repeat until no edge
    falls; ``round_checkpoint`` cuts lineage per round. A graph that
    hasn't converged after ``max_rounds`` raises rather than silently
    returning a superset.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    e0 = (edges.select(F.col(src).cast("string").alias("a"),
                       F.col(dst).cast("string").alias("b"))
          .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                 & (F.col("a") != F.col("b")))
          .select(F.least("a", "b").alias("a"),
                  F.greatest("a", "b").alias("b"))
          .dropDuplicates()
          .persist())
    spark = edges.sparkSession
    # try/finally: every exit (fixpoint, empty graph, AND the
    # non-convergence raise) must release the persisted edge table —
    # the localCheckpoint on each return value materializes it first,
    # so the finally-unpersist never recomputes
    try:
        cur = e0
        cur_cnt = e0.count()
        if cur_cnt == 0:
            return spark.createDataFrame(
                [], "a string, b string, kept int")
        for _ in range(max_rounds):
            tri = _enumerate_triangles(cur)
            charges = (tri.select(
                F.explode(F.array(
                    F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
                    F.struct(F.col("x").alias("a"), F.col("z").alias("b")),
                    F.struct(F.col("y").alias("a"), F.col("z").alias("b")),
                )).alias("e")).select("e.*")
                .groupBy("a", "b").agg(F.count("*").alias("support")))
            # zero-triangle edges never get charged — left-join them
            # back (k=2 keeps them; k>=3 peels them, explicitly not
            # implicitly)
            keep = (cur.join(charges, ["a", "b"], "left")
                    .where(F.coalesce(F.col("support"), F.lit(0)) >= k - 2)
                    .select("a", "b"))
            keep = round_checkpoint(keep, checkpoint_dir)
            n = keep.count()
            if n == cur_cnt:
                out = (e0.join(keep.withColumn("kept", F.lit(1)),
                               ["a", "b"], "left")
                       .select("a", "b",
                               F.coalesce("kept", F.lit(0)).alias("kept")))
                return out.localCheckpoint()
            cur, cur_cnt = keep, n
            if n == 0:
                out = e0.select("a", "b", F.lit(0).alias("kept"))
                return out.localCheckpoint()
        raise RuntimeError(
            f"ktruss did not converge in {max_rounds} rounds — raise "
            "max_rounds (peel depth exceeds the bound)")
    finally:
        e0.unpersist()


def _enumerate_triangles(e: DataFrame) -> DataFrame:
    """Canonical triangles (x < y < z) of a canonical edge list via the
    degree-ordered wedge join (triangle_count's bound, but keeping the
    witness columns instead of counting)."""
    deg = (e.select(F.explode(F.array("a", "b")).alias("v"))
           .groupBy("v").agg(F.count("*").alias("d")))
    ranked = (
        e.join(deg.withColumnRenamed("v", "a")
               .withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("v", "b")
              .withColumnRenamed("d", "db"), "b")
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = ranked.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("w"))
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = (
        o1.join(o2, F.col("o1.u") == F.col("o2.u"))
        .where(F.col("o1.w") < F.col("o2.w"))
        .select(F.col("o1.u").alias("pivot"),
                F.col("o1.w").alias("wa"), F.col("o2.w").alias("wb")))
    closed = wedges.join(e, (F.col("wa") == F.col("a"))
                         & (F.col("wb") == F.col("b")), "left_semi")
    return closed.select(
        F.least("pivot", "wa").alias("x"),
        F.when(F.col("pivot") < F.col("wa"), F.col("wa"))
        .otherwise(F.when(F.col("pivot") > F.col("wb"), F.col("wb"))
                   .otherwise(F.col("pivot"))).alias("y"),
        F.greatest("pivot", "wb").alias("z"))


def ktruss_py(edges, k: int = 3) -> list:
    """Exact serial twin of :func:`ktruss`."""
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    all_edges = sorted(es)
    while True:
        adj: dict = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {eab: len(adj[eab[0]] & adj[eab[1]]) for eab in es}
        nxt = {eab for eab in es if sup[eab] >= k - 2}
        if nxt == es:
            break
        es = nxt
    return [(a, b, 1 if (a, b) in es else 0) for a, b in all_edges]


def ktruss_oracle_sql(edges_cte: str, k: int, rounds: int) -> str:
    """DuckDB twin: the support peel unrolled to ``rounds`` chained
    stages (one triangle-enumeration + support-filter pair per round).
    ``rounds`` must cover the fixture's true peel depth — pin that
    with a pytest on :func:`ktruss_py` (kcore_oracle_sql contract).
    MATERIALIZED per stage for the same 3^rounds-inlining reason."""
    sql = [
        f"with base as ({edges_cte}),",
        "e0 as materialized (select distinct least(a, b) as a, "
        "greatest(a, b) as b "
        "from base where a is not null and b is not null and a <> b),",
    ]
    for i in range(rounds):
        p, c = f"e{i}", f"e{i + 1}"
        sql.append(
            f"t{i} as materialized ("
            f"select e1.a as x, e1.b as y, e2.b as z "
            f"from {p} e1 join {p} e2 on e2.a = e1.a and e2.b > e1.b "
            f"join {p} e3 on e3.a = e1.b and e3.b = e2.b),")
        sql.append(
            f"{c} as materialized ("
            f"select e.a, e.b from {p} e left join "
            f"(select a, b, count(*) as sup from ("
            f"select x as a, y as b from t{i} "
            f"union all select x as a, z as b from t{i} "
            f"union all select y as a, z as b from t{i}) group by a, b) s "
            f"on s.a = e.a and s.b = e.b "
            f"where coalesce(s.sup, 0) >= {k - 2}),")
    sql[-1] = sql[-1].rstrip(",")
    body = "\n".join(sql)
    return (f"{body}\n"
            f"select e0.a, e0.b, case when e{rounds}.a is not null "
            "then 1 else 0 end as kept\n"
            f"from e0 left join e{rounds} "
            f"on e0.a = e{rounds}.a and e0.b = e{rounds}.b")


def weighted_paths(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Bounded-hop weighted shortest distance: ``(node, dist)`` — the
    minimum total edge weight from any seed over DIRECTED paths of at
    most ``max_hops`` edges (pass both orientations for an undirected
    read). Integer non-negative weights only, validated loudly — the
    distances then replay engine-exactly, and negative-cycle semantics
    never arise. The cost-aware sibling of :func:`shortest_paths`
    (hop counts): edge weights model transfer cost / relation
    confidence / latency on entity graphs.

    Bellman-Ford rounds, set-sized: each round joins the CURRENT dist
    table with the edge list and folds candidates with one
    min-groupBy — dist is node-sized, the join is dist×out-edges, and
    with non-negative weights the loop is monotone (distances only
    tighten), so an unchanged round is the fixpoint and the loop exits
    early. Unlike BFS layering, relaxation must revisit nodes (a
    longer-hop cheaper path can undercut), which is why this is a
    separate operator instead of a weight on shortest_paths' frontier.
    Lineage cut per round; ``max_hops`` is the semantic bound (min
    over ≤ max_hops-edge paths), not a convergence failure.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    e = (edges.select(F.col(src).cast("string").alias("src"),
                      F.col(dst).cast("string").alias("dst"),
                      F.col(weight).cast("long").alias("w"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull()
                & (F.col("src") != F.col("dst"))
                & F.col("w").isNotNull())
         .dropDuplicates()
         .persist())
    neg = e.where(F.col("w") < 0).limit(1).collect()
    if neg:
        e.unpersist()
        raise ValueError(
            f"weighted_paths: negative weight on edge "
            f"({neg[0]['src']!r} -> {neg[0]['dst']!r}, w={neg[0]['w']}) — "
            "integer non-negative weights only")
    dist = round_checkpoint(
        seeds.select(F.col("node").cast("string").alias("node"))
        .dropDuplicates()
        .withColumn("dist", F.lit(0).cast("long")), checkpoint_dir)
    for _ in range(max_hops):
        # relax via a full-outer join that carries the previous dist,
        # so the convergence check is a scan over the just-checkpointed
        # frame (the old shape re-joined new vs old — one extra shuffle
        # job per round; same change as connected_components r5)
        cand = (dist.join(e, dist["node"] == e["src"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min(F.col("dist") + F.col("w")).alias("cdist")))
        new = round_checkpoint(
            dist.join(cand, "node", "full")
            .select("node",
                    F.col("dist").alias("prev"),
                    F.least("dist", "cdist").alias("dist")),
            checkpoint_dir)
        changed = (new.where(F.col("prev").isNull()
                             | (F.col("dist") < F.col("prev")))
                   .limit(1).count())
        dist = new.select("node", "dist")
        if changed == 0:
            break
    e.unpersist()
    return dist


def weighted_paths_py(edges, seed_nodes, max_hops: int = 6):
    """Serial Bellman-Ford twin (bounded hops)."""
    dist = {s: 0 for s in seed_nodes}
    es = {(a, b, w) for a, b, w in edges if a != b and w is not None}
    for _ in range(max_hops):
        nxt = dict(dist)
        for a, b, w in es:
            if a in dist and (b not in nxt or dist[a] + w < nxt[b]):
                nxt[b] = min(nxt.get(b, dist[a] + w), dist[a] + w)
        if nxt == dist:
            break
        dist = nxt
    return sorted(dist.items())


def weighted_paths_oracle_sql(edges_cte: str, seeds_cte: str,
                              max_hops: int = 6) -> str:
    """DuckDB twin: Bellman-Ford unrolled to ``max_hops`` min-fold
    stages (one relax + group-min per round, MATERIALIZED)."""
    parts = [f"""
with e as materialized (
  select distinct src, dst, cast(w as bigint) as w from ({edges_cte})
  where src is not null and dst is not null and src <> dst
    and w is not null
),
d0 as materialized (
  select distinct cast(node as varchar) as node, cast(0 as bigint) as dist
  from ({seeds_cte})
)"""]
    for r in range(1, max_hops + 1):
        parts.append(f"""d{r} as materialized (
  select node, min(dist) as dist from (
    select node, dist from d{r - 1}
    union all
    select e.dst as node, d.dist + e.w as dist
    from d{r - 1} d join e on e.src = d.node
  ) group by node
)""")
    return (",\n".join(parts)
            + f"\nselect node, dist from d{max_hops}")


def neighbor_agg(
    edges: DataFrame,
    features: DataFrame,
    id_col: str = "id",
    vec_col: str = "vec",
    scale: int = 1000,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
) -> DataFrame:
    """GraphSAGE-style 1-hop neighborhood feature aggregation: for
    every node with at least one neighbor carrying a feature vector,
    the element-wise neighbor count / sum / mean per dimension, in the
    floor-scaled integer domain (``floor(x * scale)`` per element
    BEFORE summing — the engine-exact convention; means are
    ``floor(sum / n)``). The feature-prep step GNN sampling pipelines
    (:func:`khop_sample` neighborhoods, node2vec walk contexts) need
    between the graph and the trainer.

    Plan shape, deliberately NOT an array fold: the (symmetrized) edge
    list joins features ONCE on the neighbor id, the vector
    posexplodes to scalar ``(node, dim, v_fp)`` rows, and ONE
    partial-aggregated groupBy(node, dim) folds them — map-side
    combine shrinks the shuffle to |nodes| x dim partials regardless
    of edge count (a hub's million neighbors combine locally), every
    expression is codegen-friendly scalar math, and the
    interpreted-HOF / janino-64KB traps of per-element array
    expression trees (see simsearch.py) never arise.
    """
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull()
                & (F.col("src") != F.col("dst"))))
    if not directed:
        e = e.select(F.explode(F.array(
            F.struct(F.col("src"), F.col("dst")),
            F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
        )).alias("p")).select("p.src", "p.dst")
    e = e.dropDuplicates()
    f = features.select(F.col(id_col).alias("_nbr"),
                        F.col(vec_col).cast("array<double>").alias("_v"))
    ex = (e.join(f, e["dst"] == f["_nbr"])
          .select(F.col("src").alias("node"),
                  F.posexplode(F.col("_v")).alias("dim", "_val"))
          .select("node", "dim",
                  F.floor(F.col("_val") * scale).cast("long")
                  .alias("v_fp")))
    return (ex.groupBy("node", "dim")
            .agg(F.count("*").cast("long").alias("n_nbrs"),
                 F.sum("v_fp").alias("sum_fp"))
            .select("node", "dim", "n_nbrs", "sum_fp",
                    F.floor(F.col("sum_fp") / F.col("n_nbrs"))
                    .cast("long").alias("mean_fp")))


def modularity(
    labels: DataFrame,
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Newman modularity of a node labeling over the undirected simple
    graph — the quality score that tells you whether a community
    structure (:func:`label_propagation` output, a canonicalization
    clustering, a sharding plan) actually beats random edge placement.
    ``Q = Σ_c (e_c/m − (d_c/2m)²)`` over communities c, with e_c =
    intra-community edges, d_c = total degree of c's nodes, m = edge
    count.

    Returns one row per community — ``(label, n_nodes, e_in, d_tot,
    q_ppm)`` with ``q_ppm = (1e6·e_in) div m − (1e6·d_tot²) div (2m)²``
    — so ``sum(q_ppm)/1e6`` is Q at ppm resolution and the per-
    community rows rank WHICH communities carry the structure. All
    integer arithmetic (``div`` on non-negative longs is the floor),
    so Spark and DuckDB agree bit-for-bit; ANSI mode aborts loudly if
    ``1e6·d_tot²`` overflows int64 (d_tot ≥ ~3.0e6 — at that density
    compute the degree term in DECIMAL, a documented scale seam).

    Scale shape: canonical-edge dedup, ONE labels join per endpoint
    (edge-shaped shuffles), then two partial-aggregated groupBys down
    to community-sized tables; m and 2m ride a broadcast 1-row
    aggregate. Endpoints missing from ``labels`` are a contract
    violation and fail loudly via one bounded node-sized anti-join
    check (a silently dropped endpoint would inflate Q).
    """
    e = (edges.select(F.col(src).cast("string").alias("a"),
                      F.col(dst).cast("string").alias("b"))
         .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                & (F.col("a") != F.col("b")))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .dropDuplicates()
         .persist())
    try:
        lab = labels.select(F.col("node").cast("string").alias("node"),
                            F.col("label").cast("string").alias("label"))
        ends = (e.select(F.col("a").alias("node"))
                .union(e.select(F.col("b").alias("node"))).distinct())
        missing = ends.join(lab, "node", "left_anti").limit(1).collect()
        if missing:
            raise ValueError(
                f"modularity: edge endpoint {missing[0]['node']!r} has no "
                "label — the labeling must cover every endpoint")
        el = (e.join(lab.withColumnRenamed("node", "a")
                     .withColumnRenamed("label", "la"), "a")
              .join(lab.withColumnRenamed("node", "b")
                    .withColumnRenamed("label", "lb"), "b"))
        # per-community intra edges
        e_in = (el.where(F.col("la") == F.col("lb"))
                .groupBy(F.col("la").alias("label"))
                .agg(F.count("*").alias("e_in")))
        # per-community total degree + node count: each canonical edge
        # contributes one degree to each endpoint
        deg = (el.select(F.explode(F.array("la", "lb")).alias("label"))
               .groupBy("label").agg(F.count("*").alias("d_tot")))
        nn = (lab.join(ends, "node", "left_semi")
              .groupBy("label").agg(F.count("*").alias("n_nodes")))
        m1 = e.agg(F.count("*").alias("_m"))
        out = (deg.join(e_in, "label", "left_outer")
               .join(nn, "label")
               .crossJoin(F.broadcast(m1))
               .select(
                   "label", "n_nodes",
                   F.coalesce("e_in", F.lit(0)).cast("bigint").alias("e_in"),
                   F.col("d_tot").cast("bigint").alias("d_tot"),
                   (F.expr("(1000000 * cast(coalesce(e_in, 0) as bigint))"
                           " div _m")
                    - F.expr("(1000000 * cast(d_tot as bigint) "
                             "* cast(d_tot as bigint)) div "
                             "(4 * _m * _m)")).cast("bigint")
                   .alias("q_ppm")))
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        e.unpersist()


def harmonic_centrality(
    edges: DataFrame,
    pivots: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Pivot-sampled harmonic centrality: ``h(v) = Σ_p 1/d(p, v)``
    over a deterministic pivot set — the EXACT counterpart of the
    :func:`hyperball` closeness estimate (that one sketches all-pairs;
    this one pays |pivots| BFS traversals for exact distances, the
    standard Eppstein-Wang trade at scale). Harmonic not closeness:
    unreached pairs contribute 0 instead of poisoning the mean with
    infinities, so a bounded ``max_hops`` is semantically clean.

    Returns ``(node, n_sources, h_ppm)`` for every node within
    ``max_hops`` undirected hops of ≥ 1 pivot: ``n_sources`` = pivots
    reaching it (dist ≥ 1), ``h_ppm = Σ_p 1e6 div d(p, v)`` — integer
    floor-div per term, so cross-engine exact; a pivot's own dist-0
    row is excluded (1/0), and pivots appear in the output only as
    reached by OTHER pivots.

    Scale shape: per-source BFS layering — the dist table carries
    (pivot, node), so first-reach-wins needs no min-agg re-run (the
    anti-join on (pivot, node) guarantees layer = min dist, same
    argument as :func:`shortest_paths`); per round one frontier×adjacency
    join + dedup + anti-join, all bounded by Σ_p |ball(p, r)| — the
    pivot-count knob is exactly the cost knob. Lineage cut per round;
    early exit when every pivot's frontier drains.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    e = (edges.select(F.col(src).cast("string").alias("a"),
                      F.col(dst).cast("string").alias("b"))
         .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                & (F.col("a") != F.col("b")))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .dropDuplicates())
    adj = (e.select(F.explode(F.array(
        F.struct(F.col("a").alias("w"), F.col("b").alias("v")),
        F.struct(F.col("b").alias("w"), F.col("a").alias("v")),
    )).alias("p")).select("p.w", "p.v")
        .persist())
    dist = round_checkpoint(
        pivots.select(F.col("node").cast("string").alias("pivot"))
        .dropDuplicates()
        .select("pivot", F.col("pivot").alias("node"))
        .withColumn("dist", F.lit(0)), checkpoint_dir)
    frontier = dist.select("pivot", "node")
    try:
        for r in range(1, max_hops + 1):
            reached = (adj.join(
                frontier.select("pivot", F.col("node").alias("w")), "w")
                .select("pivot", F.col("v").alias("node"))
                .dropDuplicates())
            new = round_checkpoint(
                reached.join(dist.select("pivot", "node"),
                             ["pivot", "node"], "left_anti")
                .withColumn("dist", F.lit(r)), checkpoint_dir)
            if new.isEmpty():
                break
            dist = round_checkpoint(dist.unionByName(new), checkpoint_dir)
            frontier = new.select("pivot", "node")
    finally:
        adj.unpersist()
    return (dist.where(F.col("dist") >= 1)
            .groupBy("node")
            .agg(F.count("*").cast("bigint").alias("n_sources"),
                 F.sum(F.expr("1000000 div dist")).cast("bigint")
                 .alias("h_ppm")))


def harmonic_centrality_py(edges, pivot_nodes, max_hops: int = 4):
    """Pure-Python twin of :func:`harmonic_centrality`."""
    e = {(a, b) if a < b else (b, a) for a, b in edges
         if a is not None and b is not None and a != b}
    adj: dict = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    acc: dict = {}
    for p in set(pivot_nodes):
        dist = {p: 0}
        frontier = {p}
        for r in range(1, max_hops + 1):
            nxt = {v for u in frontier for v in adj.get(u, ())
                   if v not in dist}
            if not nxt:
                break
            for v in nxt:
                dist[v] = r
            frontier = nxt
        for v, d in dist.items():
            if d >= 1:
                n, h = acc.get(v, (0, 0))
                acc[v] = (n + 1, h + 1_000_000 // d)
    return sorted((v, n, h) for v, (n, h) in acc.items())


def harmonic_centrality_oracle_sql(edges_cte: str, pivots_cte: str,
                                   max_hops: int = 4) -> str:
    """DuckDB twin of :func:`harmonic_centrality` — the per-source
    variant of ``shortest_paths_oracle_sql``'s unrolled frontier CTEs
    (MATERIALIZED against the inlining trap); the final select folds
    the dist table to (node, n_sources, h_ppm) with `//` floor-div."""
    parts = [f"""
with e0 as ({edges_cte}),
e as (
  select distinct least(a, b) as a, greatest(a, b) as b
  from e0 where a is not null and b is not null and a <> b
),
adj as materialized (
  select a as w, b as v from e union all select b as w, a as v from e
),
d0 as materialized (
  select distinct cast(node as varchar) as pv,
         cast(node as varchar) as node, 0 as dist
  from ({pivots_cte})
),
f0 as materialized (select pv, node from d0)"""]
    for r in range(1, max_hops + 1):
        parts.append(f"""f{r} as materialized (
  select distinct f.pv, a.v as node from adj a
  join f{r - 1} f on a.w = f.node
  where not exists (select 1 from d{r - 1} d
                    where d.pv = f.pv and d.node = a.v)
)""")
        parts.append(f"""d{r} as materialized (
  select pv, node, dist from d{r - 1}
  union all
  select pv, node, {r} as dist from f{r}
)""")
    return (",\n".join(parts) + f"""
select node, cast(count(*) as bigint) as n_sources,
       cast(sum(1000000 // dist) as bigint) as h_ppm
from d{max_hops} where dist >= 1 group by node""")


def betweenness_centrality(
    edges: DataFrame,
    pivots: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Pivot-sampled Brandes betweenness over the undirected graph:
    forward BFS layering carries shortest-path COUNTS (``sigma``), the
    backward sweep accumulates dependencies layer-by-layer — the exact
    two-phase structure of Brandes' algorithm (2001), sampled at a
    deterministic pivot set the way :func:`harmonic_centrality` samples
    closeness (Eppstein-Wang trade: cost = |pivots| × ball size, the
    pivot count is the knob).

    Dependencies are **integer ppm fixed point**: each backward term is
    ``sigma_v * (1e6 + delta_w) div sigma_w`` (floor per term, summed
    over the dist-(r+1) neighbors ``w``), so the distributed sum and the
    serial/DuckDB twins are bit-exact — the repo's pagerank/harmonic
    convention. The floor-per-term remainder is a documented bias, fine
    for ranking. ANSI long-overflow aborts loudly if ``sigma`` products
    ever exceed int64 (astronomically many shortest paths).

    Returns ``(node, n_sources, bc_fp)`` for every non-pivot-distance-0
    appearance: ``n_sources`` = pivots reaching the node, ``bc_fp`` =
    Σ_pivots delta in ppm (0 for BFS leaves). Bounded ``max_hops`` keeps
    both sweeps frontier-sized; truncation only drops dependencies
    flowing through paths longer than the horizon — the standard
    k-bounded betweenness semantics.

    Scale shape: forward = one frontier×adjacency join + partial-agg
    sigma sum + anti-join per round; backward = one layer×adjacency×
    layer join per round, all bounded by Σ_p |ball(p, r)|. Lineage cut
    per round; the adjacency persists for both sweeps and is released
    in ``finally``.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    e = (edges.select(F.col(src).cast("string").alias("a"),
                      F.col(dst).cast("string").alias("b"))
         .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                & (F.col("a") != F.col("b")))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .dropDuplicates())
    adj = (e.select(F.explode(F.array(
        F.struct(F.col("a").alias("w"), F.col("b").alias("v")),
        F.struct(F.col("b").alias("w"), F.col("a").alias("v")),
    )).alias("p")).select("p.w", "p.v")
        .persist())
    dist = round_checkpoint(
        pivots.select(F.col("node").cast("string").alias("pivot"))
        .dropDuplicates()
        .select("pivot", F.col("pivot").alias("node"))
        .withColumn("dist", F.lit(0))
        .withColumn("sigma", F.lit(1).cast("long")), checkpoint_dir)
    frontier = dist
    deepest = 0
    try:
        for r in range(1, max_hops + 1):
            # sigma(v) = Σ over dist-(r-1) predecessors' sigma: the
            # anti-join guarantees v is genuinely at dist r, and ONLY
            # frontier rows contribute, so the sum is exactly over
            # shortest-path predecessors
            reached = (adj.join(
                frontier.select("pivot", F.col("node").alias("w"),
                                "sigma"), "w")
                .groupBy("pivot", F.col("v").alias("node"))
                .agg(F.sum("sigma").cast("long").alias("sigma")))
            new = round_checkpoint(
                reached.join(dist.select("pivot", "node"),
                             ["pivot", "node"], "left_anti")
                .withColumn("dist", F.lit(r)), checkpoint_dir)
            if new.isEmpty():
                break
            deepest = r
            dist = round_checkpoint(
                dist.unionByName(new.select(*dist.columns)),
                checkpoint_dir)
            frontier = new
        # backward sweep: delta at the deepest layer is 0; each round
        # joins layer r to its dist-(r+1) successors' (sigma, delta)
        # dist >= 1 guards the no-edges case (deepest == 0 would
        # otherwise emit the pivots' own dist-0 rows)
        delta_next = (dist.where((F.col("dist") == deepest)
                                 & (F.col("dist") >= 1))
                      .select("pivot", "node", "sigma",
                              F.lit(0).cast("long").alias("delta")))
        layers = [delta_next]
        for r in range(deepest - 1, 0, -1):
            layer = dist.where(F.col("dist") == r)
            contrib = (layer.join(adj.withColumnRenamed("w", "node"),
                                  "node")
                       .join(delta_next.select(
                           "pivot", F.col("node").alias("v"),
                           F.col("sigma").alias("sigma_w"),
                           F.col("delta").alias("delta_w")),
                           ["pivot", "v"])
                       .groupBy("pivot", "node")
                       .agg(F.sum(F.expr(
                           "sigma * (1000000 + delta_w) div sigma_w"))
                           .cast("long").alias("delta")))
            delta_next = round_checkpoint(
                layer.join(contrib, ["pivot", "node"], "left")
                .select("pivot", "node", "sigma",
                        F.coalesce("delta", F.lit(0)).cast("long")
                        .alias("delta")), checkpoint_dir)
            layers.append(delta_next)
        out = layers[0]
        for more in layers[1:]:
            out = out.unionByName(more)
    finally:
        adj.unpersist()
    return (out.groupBy("node")
            .agg(F.count("*").cast("bigint").alias("n_sources"),
                 F.sum("delta").cast("bigint").alias("bc_fp")))


def betweenness_py(edges, pivot_nodes, max_hops: int = 4):
    """Pure-Python twin of :func:`betweenness_centrality` — the same
    floor-per-term ppm dependency recurrence, serially."""
    e = {(a, b) if a < b else (b, a) for a, b in edges
         if a is not None and b is not None and a != b}
    adj: dict = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    acc: dict = {}
    for p in set(pivot_nodes):
        dist = {p: 0}
        sigma = {p: 1}
        layers = [[p]]
        for r in range(1, max_hops + 1):
            nxt: dict = {}
            for u in layers[-1]:
                for v in adj.get(u, ()):
                    if v not in dist:
                        nxt[v] = nxt.get(v, 0) + sigma[u]
            if not nxt:
                break
            for v, s in nxt.items():
                dist[v] = r
                sigma[v] = s
            layers.append(sorted(nxt))
        delta = {v: 0 for layer in layers[1:] for v in layer}
        for r in range(len(layers) - 2, 0, -1):
            for v in layers[r]:
                delta[v] = sum(
                    sigma[v] * (1_000_000 + delta[w]) // sigma[w]
                    for w in adj.get(v, ())
                    if dist.get(w) == r + 1)
        for v, d in delta.items():
            n, b = acc.get(v, (0, 0))
            acc[v] = (n + 1, b + d)
    return sorted((v, n, b) for v, (n, b) in acc.items())


def betweenness_oracle_sql(edges_cte: str, pivots_cte: str,
                           max_hops: int = 4) -> str:
    """DuckDB twin of :func:`betweenness_centrality`: the
    ``harmonic_centrality_oracle_sql`` forward unroll extended with a
    sigma sum per layer, then one MATERIALIZED dependency CTE per
    backward layer using the identical floor-per-term `//` recurrence.
    The unroll runs all ``max_hops`` layers (empty ones union nothing),
    so it needs no early-exit bookkeeping."""
    parts = [f"""
with e0 as ({edges_cte}),
e as (
  select distinct least(a, b) as a, greatest(a, b) as b
  from e0 where a is not null and b is not null and a <> b
),
adj as materialized (
  select a as w, b as v from e union all select b as w, a as v from e
),
d0 as materialized (
  select distinct cast(node as varchar) as pv,
         cast(node as varchar) as node, 0 as dist,
         cast(1 as bigint) as sigma
  from ({pivots_cte})
),
f0 as materialized (select pv, node, sigma from d0)"""]
    for r in range(1, max_hops + 1):
        parts.append(f"""f{r} as materialized (
  select f.pv, a.v as node, cast(sum(f.sigma) as bigint) as sigma
  from adj a join f{r - 1} f on a.w = f.node
  where not exists (select 1 from d{r - 1} d
                    where d.pv = f.pv and d.node = a.v)
  group by f.pv, a.v
)""")
        parts.append(f"""d{r} as materialized (
  select pv, node, dist, sigma from d{r - 1}
  union all
  select pv, node, {r} as dist, sigma from f{r}
)""")
    D = max_hops
    parts.append(f"""dl{D} as materialized (
  select pv, node, sigma, cast(0 as bigint) as delta
  from d{D} where dist = {D}
)""")
    for r in range(D - 1, 0, -1):
        parts.append(f"""g{r} as materialized (
  select v.pv, v.node,
         cast(sum(v.sigma * (1000000 + w.delta) // w.sigma) as bigint)
           as delta
  from (select pv, node, sigma from d{D} where dist = {r}) v
  join adj a on a.w = v.node
  join dl{r + 1} w on w.pv = v.pv and w.node = a.v
  group by v.pv, v.node
)""")
        parts.append(f"""dl{r} as materialized (
  select v.pv, v.node, v.sigma, coalesce(g.delta, 0) as delta
  from (select pv, node, sigma from d{D} where dist = {r}) v
  left join g{r} g on g.pv = v.pv and g.node = v.node
)""")
    union = "\n  union all\n  ".join(
        f"select pv, node, delta from dl{r}" for r in range(1, D + 1))
    return (",\n".join(parts) + f"""
select node, cast(count(*) as bigint) as n_sources,
       cast(sum(delta) as bigint) as bc_fp
from (
  {union}
) group by node""")


HITS_SCALE = 1_000_000  # hub/authority fixed-point scale


def hits(
    edges: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over the DIRECTED
    edge list in integer fixed point: per round ``a(v) = Σ_{u→v} h(u)``
    then ``h(u) = Σ_{u→v} a(v)``, each half-round renormalized by its
    exact integer max (``x * SCALE div max``) instead of the float L2
    norm — max-normalization keeps the iteration in bounded int64 and
    is order-independent, so the distributed sums and the DuckDB twin
    replay bit-exact (the pagerank convention; the textbook L2 norm is
    a monotone rescaling per round, rankings are unchanged).

    Returns ``(node, hub_fp, auth_fp)`` for every node of the graph
    (0 for no-out / no-in nodes; a graph whose scores all drain to 0
    keeps emitting zeros rather than dividing by zero).

    Scale shape per round: two edge⋈vector joins + two partial-agg
    groupBys (both |V|-bounded), two 1-row max aggregates broadcast
    back — no full-graph shuffle beyond the keyed sums. Edges persist
    for the loop; lineage cut per half-round.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = (edges.select(F.col(src).cast("string").alias("u"),
                      F.col(dst).cast("string").alias("v"))
         .where(F.col("u").isNotNull() & F.col("v").isNotNull()
                & (F.col("u") != F.col("v")))
         .dropDuplicates()
         .persist())
    nodes = (e.select(F.col("u").alias("node"))
             .union(e.select(F.col("v").alias("node")))
             .distinct().persist())
    try:
        h = nodes.select(
            "node", F.lit(HITS_SCALE).cast("long").alias("score"))
        a = None
        for _ in range(rounds):
            # checkpoint the RAW half-round, then normalize lazily from
            # the checkpoint: the norm's crossJoin(broadcast(max)) has
            # the half-round pipeline on BOTH its broadcast and probe
            # sides, and AQE does not reuse the exchange — normalizing
            # before the checkpoint executed every half-round twice
            # (r5: measured 13.0 → ~7 s on the bench fixture)
            a_raw = round_checkpoint(
                _hits_half(nodes, e, h, "u", "v"), checkpoint_dir)
            a = _hits_norm(a_raw)
            h_raw = round_checkpoint(
                _hits_half(nodes, e, a, "v", "u"), checkpoint_dir)
            h = _hits_norm(h_raw)
        return (nodes
                .join(h.withColumnRenamed("score", "hub_fp"), "node")
                .join(a.withColumnRenamed("score", "auth_fp"), "node")
                .select("node", F.col("hub_fp").cast("bigint"),
                        F.col("auth_fp").cast("bigint")))
    finally:
        e.unpersist()
        nodes.unpersist()


def _hits_half(nodes: DataFrame, e: DataFrame, vec: DataFrame,
               from_col: str, to_col: str) -> DataFrame:
    """One un-normalized half-round: score'(to) = Σ score(from)."""
    s = (e.join(vec.withColumnRenamed("node", from_col), from_col)
         .groupBy(F.col(to_col).alias("node"))
         .agg(F.sum("score").cast("long").alias("score")))
    return (nodes.join(s, "node", "left")
            .select("node", F.coalesce("score", F.lit(0)).cast("long")
                    .alias("score")))


def _hits_norm(vec: DataFrame) -> DataFrame:
    """Exact integer max-normalization; an all-zero vector passes
    through (no division), so degenerate graphs stay at zero."""
    mx = vec.agg(F.max("score").alias("mx"))
    return (vec.crossJoin(F.broadcast(mx))
            .select("node",
                    F.when(F.col("mx") > 0,
                           F.expr(f"score * {HITS_SCALE}L div mx"))
                    .otherwise(F.lit(0)).cast("long").alias("score")))


def hits_oracle_sql(edges_cte: str, rounds: int) -> str:
    """DuckDB twin of :func:`hits`: one MATERIALIZED CTE pair per
    half-round with the identical integer max-normalization."""
    sql = [
        f"with e0 as ({edges_cte}),",
        "e as materialized (select distinct u, v from ("
        "select cast(a as varchar) as u, cast(b as varchar) as v from e0)"
        " where u is not null and v is not null and u <> v),",
        "nodes as materialized (select u as node from e "
        "union select v as node from e),",
        f"h0 as materialized (select node, cast({HITS_SCALE} as bigint)"
        " as score from nodes),",
    ]
    for i in range(rounds):
        sql.append(
            f"a{i + 1}r as (select n.node, coalesce(s.score, 0) as score"
            " from nodes n left join (select e.v as node,"
            f" sum(h.score) as score from e join h{i} h on h.node = e.u"
            " group by e.v) s on s.node = n.node),")
        sql.append(
            f"a{i + 1} as materialized (select node, case when mx > 0"
            f" then score * {HITS_SCALE} // mx else 0 end as score"
            f" from a{i + 1}r, (select max(score) as mx from a{i + 1}r)),")
        sql.append(
            f"h{i + 1}r as (select n.node, coalesce(s.score, 0) as score"
            " from nodes n left join (select e.u as node,"
            f" sum(a.score) as score from e join a{i + 1} a on a.node = e.v"
            " group by e.u) s on s.node = n.node),")
        sql.append(
            f"h{i + 1} as materialized (select node, case when mx > 0"
            f" then score * {HITS_SCALE} // mx else 0 end as score"
            f" from h{i + 1}r, (select max(score) as mx from h{i + 1}r)),")
    body = "\n".join(sql).rstrip()
    assert body.endswith("),")
    body = body[:-2] + ")"
    return body + (
        f"\nselect n.node, cast(h.score as bigint) as hub_fp,"
        f" cast(a.score as bigint) as auth_fp from nodes n"
        f" join h{rounds} h on h.node = n.node"
        f" join a{rounds} a on a.node = n.node")


def hits_py(edges, rounds: int = 4):
    """Pure-Python twin of :func:`hits`."""
    e = {(str(u), str(v)) for u, v in edges
         if u is not None and v is not None and u != v}
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    h = {n: HITS_SCALE for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(rounds):
        a = {n: 0 for n in nodes}
        for u, v in e:
            a[v] += h[u]
        mx = max(a.values(), default=0)
        a = {n: (s * HITS_SCALE // mx if mx > 0 else 0)
             for n, s in a.items()}
        h = {n: 0 for n in nodes}
        for u, v in e:
            h[u] += a[v]
        mx = max(h.values(), default=0)
        h = {n: (s * HITS_SCALE // mx if mx > 0 else 0)
             for n, s in h.items()}
    return sorted((n, h[n], a[n]) for n in nodes)


def minimum_spanning_forest(
    edges: DataFrame,
    max_rounds: int = 20,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Borůvka minimum spanning forest over the undirected weighted
    edge list — THE distributed MST algorithm (each round every
    component grabs its cheapest outgoing edge, components merge,
    rounds ≤ ⌈log₂ V⌉): the backbone extractor for KG visualization,
    hierarchical clustering (single-linkage = MSF + cut), and network
    cost planning.

    Determinism without a distinct-weights requirement: edges compare
    by the TUPLE ``(weight, a, b)`` (canonical endpoints), which is a
    strict total order, so the MSF is unique and Kruskal on the same
    order (the serial twin) returns the identical edge set — the
    standard tie-break trick.

    Per round: one comp-label join per endpoint, one min-struct
    partial agg per component (cheapest outgoing edge), then the
    selected forest — a component-count-sized edge set that shrinks
    geometrically — merges via :func:`..canon.connected_components`
    and the label map joins back. Non-cross edges are dropped from
    the working set each round, so the big table only ever shrinks.
    Raises when ``max_rounds`` rounds leave cross edges (never for
    max_rounds ≥ ⌈log₂ V⌉ — each round at least halves components).

    Returns the forest edges ``(a, b, weight)``, |V| − #components
    rows, canonical a < b.
    """
    from .canon import connected_components

    e0 = (edges.select(F.col(src).cast("string").alias("x"),
                       F.col(dst).cast("string").alias("y"),
                       F.col(weight).cast("long").alias("w"))
          .where(F.col("x").isNotNull() & F.col("y").isNotNull()
                 & F.col("w").isNotNull() & (F.col("x") != F.col("y")))
          .select(F.least("x", "y").alias("a"),
                  F.greatest("x", "y").alias("b"), "w")
          .groupBy("a", "b").agg(F.min("w").alias("w")))
    work = round_checkpoint(e0, checkpoint_dir)
    comp = round_checkpoint(
        work.select(F.col("a").alias("node"))
        .union(work.select(F.col("b").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("comp")), checkpoint_dir)
    chosen = None
    for _ in range(max_rounds):
        lab = (work
               .join(comp.select(F.col("node").alias("a"),
                                 F.col("comp").alias("ca")), "a")
               .join(comp.select(F.col("node").alias("b"),
                                 F.col("comp").alias("cb")), "b")
               .where(F.col("ca") != F.col("cb")))
        work = round_checkpoint(lab.select("a", "b", "w"),
                                checkpoint_dir)
        if work.isEmpty():
            break
        # cheapest outgoing edge per component, (w, a, b) total order
        pick = F.struct("w", "a", "b").alias("e")
        sel = (lab.select(F.col("ca").alias("c"), pick)
               .union(lab.select(F.col("cb").alias("c"), pick))
               .groupBy("c").agg(F.min("e").alias("e"))
               .select("e.a", "e.b", "e.w")
               .dropDuplicates(["a", "b"]))
        sel = round_checkpoint(sel, checkpoint_dir)
        chosen = (sel if chosen is None
                  else round_checkpoint(chosen.unionByName(sel),
                                        checkpoint_dir))
        # merge the component forest (component-count-sized, shrinks
        # geometrically); labels rebase through the merge map. Late
        # rounds' merge graphs are vocabulary-sized — the documented
        # local_threshold opt-in (same rationale as canonical_entities'
        # hub projection); the first rounds at corpus scale exceed the
        # threshold and take the distributed star-contraction path.
        merged = connected_components(
            sel.join(comp.select(F.col("node").alias("a"),
                                 F.col("comp").alias("ca")), "a")
            .join(comp.select(F.col("node").alias("b"),
                              F.col("comp").alias("cb")), "b")
            .select(F.col("ca").alias("src"), F.col("cb").alias("dst")),
            local_threshold=200_000,
            checkpoint_dir=checkpoint_dir)
        comp = round_checkpoint(
            comp.join(merged.withColumnRenamed("node", "comp")
                      .withColumnRenamed("component", "newc"),
                      "comp", "left")
            .select("node", F.coalesce("newc", F.col("comp"))
                    .alias("comp")), checkpoint_dir)
    else:
        # The last allowed round may have completed the forest — its
        # emptiness check only happens at the TOP of the next round.
        # Re-label the leftover working set against the FINAL labels
        # and raise only if cross edges actually remain.
        rem = (work
               .join(comp.select(F.col("node").alias("a"),
                                 F.col("comp").alias("ca")), "a")
               .join(comp.select(F.col("node").alias("b"),
                                 F.col("comp").alias("cb")), "b")
               .where(F.col("ca") != F.col("cb")))
        if not rem.isEmpty():
            raise RuntimeError(
                f"minimum_spanning_forest: cross edges remain after "
                f"{max_rounds} rounds (components halve per round — "
                f"raise max_rounds past log2(V))")
    if chosen is None:
        return e0.select("a", "b", F.col("w").alias("weight")).limit(0)
    return chosen.select("a", "b", F.col("w").alias("weight"))


def minimum_spanning_forest_py(edges):
    """Serial Kruskal twin on the identical (weight, a, b) total
    order — unique MSF, so Borůvka must return exactly this set."""
    canon = {}
    for x, y, w in edges:
        if x is None or y is None or w is None or x == y:
            continue
        a, b = (x, y) if x < y else (y, x)
        if (a, b) not in canon or w < canon[(a, b)]:
            canon[(a, b)] = w
    parent: dict = {}

    def find(u):
        while parent.setdefault(u, u) != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    out = []
    for (a, b), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)


def wl_refine(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    pred: str | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Weisfeiler-Leman color refinement over the directed (optionally
    predicate-labeled) edge list — the canonical-labeling primitive
    under RDF blank-node canonicalization (URDNA2015's hash-and-refine
    loop is 1-WL with a cryptographic hash; the reference mints BNodes
    whose identity is only stable WITHIN a run, csvw.py:305,351,524),
    graph-isomorphism fingerprinting, and structural-role clustering
    (the per-node sibling of characteristic sets).

    color_0 = H60('wl0'); per round each node absorbs the MULTISET of
    (direction, predicate, neighbor color) triples. The multiset is
    hashed commutatively — Σ of per-edge 32-bit terms — NOT by sorting
    a collected list: the aggregation stays a map-side-combinable
    ``sum``, so a 10^8-degree hub costs a partial agg, never a
    collect_list sort. Terms are 32-bit (H32) so 2^31 of them fit in
    int64 under ANSI mode; the round hash is

        color' = H60('wlC|' || color || '|' || coalesce(Σ terms, -1))

    with H60/H32 the portable md5 hashes the DuckDB twin replays
    bit-exactly. After k rounds two nodes share a color iff 1-WL
    cannot distinguish their k-neighborhoods (every output node is an
    edge endpoint, so the -1 sentinel is pure belt-and-braces — it
    would only fire on a termless node). Per round: ONE join (terms ⋈
    colors on
    the neighbor) + ONE partial-agg sum + a node-sized left join;
    lineage cut per round via :func:`..canon.round_checkpoint`.

    Returns (node, color) for every edge endpoint, color int64.
    """
    if rounds < 0:
        raise ValueError(f"wl_refine: rounds must be >= 0, got {rounds}")
    p = (F.col(pred).cast("string") if pred is not None
         else F.lit("")).alias("p")
    e = (edges.select(F.col(src).cast("string").alias("s"),
                      F.col(dst).cast("string").alias("d"), p)
         .where(F.col("s").isNotNull() & F.col("d").isNotNull()))
    terms = round_checkpoint(
        e.select(F.col("s").alias("node"), F.lit("o").alias("dir"),
                 "p", F.col("d").alias("nbr"))
        .unionByName(
            e.select(F.col("d").alias("node"), F.lit("i").alias("dir"),
                     "p", F.col("s").alias("nbr"))),
        checkpoint_dir)
    colors = round_checkpoint(
        terms.select("node").distinct()
        .select("node", portable_hash60(F.lit("wl0")).alias("color")),
        checkpoint_dir)
    for _ in range(rounds):
        t = (terms
             .join(colors.select(F.col("node").alias("nbr"),
                                 F.col("color").alias("nc")), "nbr")
             .select("node", portable_hash32(
                 F.concat_ws("|", F.lit("wlE"), F.col("dir"), F.col("p"),
                             F.col("nc").cast("string"))).alias("term"))
             .groupBy("node").agg(F.sum("term").alias("s")))
        colors = round_checkpoint(
            colors.join(t, "node", "left")
            .select("node", portable_hash60(
                F.concat_ws("|", F.lit("wlC"),
                            F.col("color").cast("string"),
                            F.coalesce(F.col("s"), F.lit(-1))
                            .cast("string"))).alias("color")),
            checkpoint_dir)
    return colors


def wl_refine_py(edges, rounds: int = 3):
    """Serial twin of :func:`wl_refine` — same md5 arithmetic, so the
    distributed rounds must return bit-identical colors."""
    import hashlib

    def h60(x: str) -> int:
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    def h32(x: str) -> int:
        return int(hashlib.md5(x.encode()).hexdigest()[:8], 16)

    rows = [(str(s), str(d), "" if p is None else str(p))
            for s, d, p in edges if s is not None and d is not None]
    terms: dict = {}
    for s, d, p in rows:
        terms.setdefault(s, []).append(("o", p, d))
        terms.setdefault(d, []).append(("i", p, s))
    colors = {n: h60("wl0") for n in terms}
    for _ in range(rounds):
        nxt = {}
        for n, tl in terms.items():
            tot = sum(h32("|".join(("wlE", dr, p, str(colors[nb]))))
                      for dr, p, nb in tl)
            nxt[n] = h60("|".join(("wlC", str(colors[n]), str(tot))))
        colors = nxt
    return sorted(colors.items())


def wl_refine_oracle_sql(edges_sql: str, rounds: int = 3) -> str:
    """DuckDB twin of :func:`wl_refine`. ``edges_sql`` must yield
    (s, d, p). Every CTE that a later CTE references twice is
    ``as materialized`` (the DuckDB inlining trap — CLAUDE.md); the
    per-round sum is cast to BIGINT inside the CTE so no HUGEINT ever
    reaches the output (the r3 driver-red class)."""
    from ..functions.hashing import portable_hash32_sql, portable_hash60_sql

    parts = [
        f"e0 as materialized ({edges_sql})",
        "t as materialized ("
        " select s as node, 'o' as dir, p, d as nbr from e0"
        " union all"
        " select d as node, 'i' as dir, p, s as nbr from e0)",
        "c0 as materialized (select distinct node, "
        + portable_hash60_sql("'wl0'") + " as color from t)",
    ]
    term = portable_hash32_sql(
        "concat_ws('|', 'wlE', t.dir, t.p, cast(c.color as varchar))")
    for k in range(1, rounds + 1):
        parts.append(
            f"a{k} as materialized ("
            f" select t.node, cast(sum({term}) as bigint) as s"
            f" from t join c{k - 1} c on t.nbr = c.node"
            f" group by t.node)")
        nxt = portable_hash60_sql(
            "concat_ws('|', 'wlC', cast(c.color as varchar),"
            " cast(coalesce(a.s, -1) as varchar))")
        parts.append(
            f"c{k} as materialized ("
            f" select c.node, {nxt} as color"
            f" from c{k - 1} c left join a{k} a on a.node = c.node)")
    return ("with " + ",\n".join(parts)
            + f"\nselect node, color from c{rounds}")


def single_linkage(
    edges: DataFrame,
    threshold: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Single-linkage flat clustering at distance ``threshold``: two
    nodes share a cluster iff a path of edges with weight ≤ threshold
    connects them — exactly the cut of the single-linkage dendrogram
    at that height (HAC's cheapest member, and the only one whose
    merge tree IS the minimum spanning forest). The ER/dedup stack's
    grouping stage for distance-valued pairwise scores (edit-distance
    verify, fuzzy-join costs) where the similarity stacks use CC
    directly.

    Scale shape: one filter (map-only, pushed to the edge scan) then
    :func:`..canon.connected_components` over the surviving edges —
    for MANY cuts of the same graph, run
    :func:`minimum_spanning_forest` ONCE and feed the forest here:
    CC({e : w ≤ t}) = CC({f ∈ MSF : w ≤ t}), so every extra threshold
    costs a CC over ≤ V−1 edges instead of E (pinned by the
    forest-cut-equivalence test). Every endpoint of the INPUT edge set
    is returned; nodes whose every edge exceeds the threshold come
    back as singletons (cluster = own id), matching scipy's fcluster
    'distance' criterion on the same matrix.

    Returns (node, cluster), cluster = min node id in the cluster.
    """
    from .canon import connected_components

    e = (edges.select(F.col(src).cast("string").alias("x"),
                      F.col(dst).cast("string").alias("y"),
                      F.col(weight).cast("long").alias("w"))
         .where(F.col("x").isNotNull() & F.col("y").isNotNull()))
    nodes = (e.select(F.col("x").alias("node"))
             .union(e.select(F.col("y").alias("node")))
             .distinct())
    keep = (e.where((F.col("w") <= F.lit(int(threshold)))
                    & (F.col("x") != F.col("y")))
            .select(F.col("x").alias("src"), F.col("y").alias("dst")))
    cc = connected_components(keep, checkpoint_dir=checkpoint_dir)
    return (nodes.join(cc, "node", "left")
            .select("node", F.coalesce("component", F.col("node"))
                    .alias("cluster")))


def single_linkage_py(edges, threshold):
    """Serial union-find twin of :func:`single_linkage` (same node
    universe, same min-id labels); sorted (node, cluster) tuples."""
    parent: dict = {}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for s, d, _ in edges:
        parent.setdefault(s, s)
        parent.setdefault(d, d)
    for s, d, w in edges:
        if w <= threshold and s != d:
            rs, rd = find(s), find(d)
            if rs != rd:
                parent[rs] = rd
    roots: dict = {}
    for v in parent:
        roots.setdefault(find(v), []).append(v)
    out = []
    for members in roots.values():
        lab = min(members)
        out.extend((v, lab) for v in members)
    return sorted(out)


def butterfly_count(
    edges: DataFrame,
    left_col: str = "l",
    right_col: str = "r",
) -> DataFrame:
    """Exact butterfly (2×2-biclique / 4-cycle) census of a bipartite
    graph — the bipartite analogue of :func:`triangle_count` (triangles
    cannot exist in a bipartite graph, so butterflies are ITS smallest
    cohesion motif; Wang et al. VLDB'14, Sanei-Mehri et al. KDD'18).
    For KG-construction corpora the natural bipartite layers are
    document↔entity, user↔document, conversation↔tool: a butterfly is
    two documents sharing two entities — the minimal co-citation
    evidence unit — and the butterfly density drives bipartite
    community detection the way triangle density drives unipartite.

    Input: bipartite edges ``(left, right)`` (duplicates tolerated; the
    two columns are DISTINCT namespaces — a value appearing on both
    sides denotes two different vertices, per the bipartite contract).
    Returns one row
    ``(n_butterflies, n_edges, n_left, n_right, wedges_left,
    wedges_right)`` — every value side-independent and exact:
    butterflies = Σ_{pairs p of same-side vertices} C(common(p), 2),
    identical whichever side the pairs range over; wedges_X =
    Σ_{v∈X} C(d(v), 2) are the two caterpillar denominators, so the
    bipartite clustering coefficient 4·♀/(wedges_left+wedges_right) is
    a one-line postprocess.

    Scale shape: wedge generation pivots on the side with the SMALLER
    Σ C(d,2) (decided by one 2-row aggregate — the vertex-priority
    rule of the parallel butterfly literature, here at side
    granularity): one self-join on the pivot vertex bounded by
    min(wedges_left, wedges_right), one pair-keyed partial-agg count,
    one Σ C(c,2) fold. A mention-hub on the cheap side still bounds
    the join by its C(d,2); for corpora where BOTH sides carry
    celebrity hubs, pre-cap with the co-occurrence cap discipline
    (:func:`cow_spark.operators.mentions.cooccurrence_edges`) and
    report the exclusion — this function itself never silently drops.
    """
    e = (edges.select(F.col(left_col).cast("string").alias("l"),
                      F.col(right_col).cast("string").alias("r"))
         .where(F.col("l").isNotNull() & F.col("r").isNotNull())
         .dropDuplicates()
         .persist())
    try:
        n_edges = e.count()
        dl = e.groupBy("l").count()
        dr = e.groupBy("r").count()
        c2 = F.sum(F.expr("count * (count - 1) div 2")).cast("long")
        n_left, wedges_left = dl.agg(
            F.count("*").cast("long"), c2).first()
        n_right, wedges_right = dr.agg(
            F.count("*").cast("long"), c2).first()
        wedges_left = int(wedges_left or 0)
        wedges_right = int(wedges_right or 0)
        # pivot on the cheaper side; pair vertices of the other side
        pivot, other = ("l", "r") if wedges_left <= wedges_right \
            else ("r", "l")
        a, b = e.alias("a"), e.alias("b")
        pairs = (
            a.join(b, F.col(f"a.{pivot}") == F.col(f"b.{pivot}"))
            .where(F.col(f"a.{other}") < F.col(f"b.{other}"))
            .groupBy(F.col(f"a.{other}").alias("x"),
                     F.col(f"b.{other}").alias("y"))
            .agg(F.count("*").alias("c"))
        )
        n_bf = int(pairs.agg(
            F.sum(F.expr("c * (c - 1) div 2")).cast("long")
        ).first()[0] or 0)
    finally:
        e.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(n_bf, int(n_edges), int(n_left), int(n_right),
          wedges_left, wedges_right)],
        "n_butterflies long, n_edges long, n_left long, n_right long, "
        "wedges_left long, wedges_right long")


def mixing_metrics(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Reciprocity and degree assortativity — the two classic mixing
    diagnostics of a directed graph (Newman, PRE 67:026126). For KG
    audit they answer: do relations run both ways (reciprocity — e.g.
    replies-to between speakers, mutual sameAs candidates), and do
    hubs link to hubs or to leaves (assortativity — dis-assortative
    entity graphs are hub-and-spoke, assortative ones are clubby)?

    Returns one row ``(n_nodes, n_dir_edges, n_undir_edges,
    n_reciprocal, reciprocity_ppm, assortativity_ppm)``:

    - reciprocity = |{(u,v) : (v,u) also present}| / |directed edges|
      over the distinct self-loop-free directed edge set (NULL when
      empty).
    - assortativity = Pearson correlation of endpoint degrees over
      both orientations of the simple undirected graph, computed in
      EXACT integer arithmetic: with M = 2·|E|, r_ppm =
      ⌊10⁶·(M·Σxy − (Σx)²) / (M·Σx² − (Σx)²)⌋ (x, y marginals are
      identical by symmetry). NULL for a degree-regular graph
      (variance 0). Integer products bound: M·Σx² ≤ 2m·Σd² — raises
      loudly under ANSI instead of wrapping if a corpus ever exceeds
      int64 (switch the three sums to decimal(38,0) then).

    Scale shape: degree aggregate, two edge-shaped joins (degrees
    onto orientations; reciprocity's reverse-key semi-join), and 1-row
    global aggregates — no iteration, no driver loop; collects are
    single bounded rows (triangle_count's eager contract).
    """
    d = (edges.select(F.col(src).cast("string").alias("s"),
                      F.col(dst).cast("string").alias("t"))
         .where(F.col("s").isNotNull() & F.col("t").isNotNull()
                & (F.col("s") != F.col("t")))
         .dropDuplicates()
         .persist())
    try:
        m_dir = d.count()
        rev = d.select(F.col("t").alias("s"), F.col("s").alias("t"))
        n_recip = d.join(rev, ["s", "t"], "left_semi").count()

        e = (d.select(F.least("s", "t").alias("a"),
                      F.greatest("s", "t").alias("b"))
             .dropDuplicates())
        deg = (e.select(F.explode(F.array("a", "b")).alias("v"))
               .groupBy("v").agg(F.count("*").alias("deg")))
        n_nodes = deg.count()
        m_und = e.count()
        both = e.union(e.select(F.col("b").alias("a"),
                                F.col("a").alias("b")))
        j = (both.join(deg.select(F.col("v").alias("a"),
                                  F.col("deg").alias("x")), "a")
             .join(deg.select(F.col("v").alias("b"),
                              F.col("deg").alias("y")), "b"))
        row = j.agg(
            F.count("*").alias("m2"),
            F.sum(F.col("x")).alias("sx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        ).first()
    finally:
        d.unpersist()
    assort = None
    if row.m2:
        num = row.m2 * row.sxy - row.sx * row.sx
        den = row.m2 * row.sxx - row.sx * row.sx
        if den > 0:
            assort = (1_000_000 * num) // den  # Python floor = DuckDB //
    recip = (1_000_000 * n_recip) // m_dir if m_dir else None
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(int(n_nodes), int(m_dir), int(m_und), int(n_recip),
          recip, assort)],
        "n_nodes long, n_dir_edges long, n_undir_edges long, "
        "n_reciprocal long, reciprocity_ppm long, assortativity_ppm long")


def wl_quotient(
    edges: DataFrame,
    rounds: int = 2,
    src: str = "src",
    dst: str = "dst",
    pred: str | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """k-bisimulation structural summary (quotient graph) of a
    directed, optionally predicate-labeled KG: nodes are grouped by
    their :func:`wl_refine` color after ``rounds`` rounds (two nodes
    share a class iff 1-WL cannot distinguish their k-neighborhoods —
    the standard bisimulation-summary construction of the RDF
    structural-index literature), and every edge collapses onto its
    class pair. The summary answers "what SHAPES does this KG contain"
    at |classes|² cost instead of |V|², and is the index layer for
    query planning over heterogeneous KGs (a BGP can be pruned against
    the summary before touching the corpus-scale triple table).

    Returns ``(src_color, p, dst_color, n_edges, n_src_nodes,
    n_dst_nodes)`` — one row per summary edge with the exact support
    counts (``p`` is '' when ``pred`` is None, mirroring wl_refine).
    Input edges are DEDUPLICATED on (s, p, d) first and the SAME
    deduped set feeds color refinement — duplicates would shift the
    commutative multiset sums and the summary counts in lockstep, so
    pinning one canonical multiplicity keeps the contract stable.

    Scale shape: wl_refine's per-round join+partial-agg (hub-safe by
    construction), then two node-keyed joins of the deduped edge set
    against the (node, color) table and one class-pair-keyed partial
    aggregate — all edge-shaped; the distinct-node counts ride the
    same aggregate (two count-distincts over already-grouped rows).
    """
    p = (F.col(pred).cast("string") if pred is not None
         else F.lit("")).alias("p")
    e = (edges.select(F.col(src).cast("string").alias("s"),
                      F.col(dst).cast("string").alias("d"), p)
         .where(F.col("s").isNotNull() & F.col("d").isNotNull())
         .dropDuplicates())
    e = round_checkpoint(e, checkpoint_dir)
    colors = wl_refine(e, rounds=rounds, src="s", dst="d", pred="p",
                       checkpoint_dir=checkpoint_dir)
    return (
        e.join(colors.select(F.col("node").alias("s"),
                             F.col("color").alias("src_color")), "s")
        .join(colors.select(F.col("node").alias("d"),
                            F.col("color").alias("dst_color")), "d")
        .groupBy("src_color", "p", "dst_color")
        .agg(F.count("*").cast("long").alias("n_edges"),
             F.countDistinct("s").cast("long").alias("n_src_nodes"),
             F.countDistinct("d").cast("long").alias("n_dst_nodes"))
    )


def wl_quotient_oracle_sql(edges_sql: str, rounds: int = 2) -> str:
    """DuckDB twin of :func:`wl_quotient`: the wl_refine unroll as a
    subquery (referenced twice → materialized), then the same two
    joins + class-pair aggregate. ``edges_sql`` must yield DISTINCT
    (s, d, p) — the same dedup contract the operator enforces."""
    wl = wl_refine_oracle_sql(edges_sql, rounds=rounds)
    return f"""
with e as materialized ({edges_sql}),
wl as materialized ({wl})
select ca.color as src_color, e.p, cb.color as dst_color,
       cast(count(*) as bigint) as n_edges,
       cast(count(distinct e.s) as bigint) as n_src_nodes,
       cast(count(distinct e.d) as bigint) as n_dst_nodes
from e
join wl ca on ca.node = e.s
join wl cb on cb.node = e.d
group by 1, 2, 3
"""


def neighborhood_function(nf: DataFrame) -> DataFrame:
    """Graph-level neighborhood function + effective diameter from a
    :func:`hyperball` table — the whole-graph distance read (how far
    is "most of" the graph?) that closeness (:func:`hyperball_
    closeness`) doesn't give: NF(t) = Σ_v |ball(v, t)| is the count
    of (ordered) pairs within distance t, and the standard effective
    diameter is the smallest t with NF(t) ≥ 90% of NF(t_max) (Boldi &
    Vigna's reading of ANF, Palmer 2002).

    One row per radius: ``(radius, nf_sum, share_ppm, ge_90pct)`` —
    the FIRST true ``ge_90pct`` row is the effective diameter; the
    share is floor-scaled against the largest computed radius, so if
    ``rounds`` undershot the true diameter the table says so (top row
    pinned at 10⁶ by construction, earlier rows far below it).

    Scale shape: one partial-agg groupBy over the |V|·(rounds+1)-row
    hyperball output + a 1-row broadcast of the top radius's total.
    Estimates are the portable-HLL integers, so the DuckDB replay is
    bit-exact.
    """
    per_r = nf.groupBy("radius").agg(
        F.sum("est").cast("long").alias("nf_sum"))
    top = (per_r.orderBy(F.desc("radius")).limit(1)
           .select(F.col("nf_sum").alias("_max")))
    share = F.col("nf_sum") * F.lit(1_000_000)
    return (per_r.crossJoin(F.broadcast(top))
            .select("radius", "nf_sum",
                    ((share - F.pmod(share, F.col("_max")))
                     / F.col("_max")).cast("long").alias("share_ppm"))
            .withColumn("ge_90pct", F.col("share_ppm") >= 900_000))


KATZ_S = 1_000_000  # Katz fixed-point scale (ppm)


def katz_centrality(
    edges: DataFrame,
    alpha_ppm: int = 50_000,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Truncated Katz centrality, integer-exact: after K rounds of

        x'(v) = Σ_{u→v} (alpha_ppm · (S + x(u))) div S

    ``x`` is the ppm-scaled count of attenuated walks of length ≤ K
    ENDING at v — the influence measure that, unlike PageRank, does
    not normalize away a hub's raw pull (citation/mention graphs want
    that), and unlike HITS is stable on directed acyclic regions. The
    attenuation is applied PER EDGE before the sum (floor division on
    each contribution), which map-side combines and bounds each term
    at alpha_ppm·(S + x_max) — the order the DuckDB twin replays.

    Convergence/overflow contract: the truncated sum is exact for any
    alpha, but x grows as (alpha·d_max)^K — callers must keep
    alpha_ppm·d_max < 10^6 (the classic 1/λ_max bound) or accept
    divergence; under ANSI an int64 overflow fails LOUDLY rather than
    wrapping, which is the correct behavior for a mis-tuned alpha.

    Per round: one edge⋈rank join + one partial-agg sum + a node-sized
    left join, lineage cut via round_checkpoint — the pagerank loop
    shape; edges/nodes persist for the loop (AQE breaks ReuseExchange)
    and are released before returning. Returns (node, katz_fp).
    """
    if rounds < 1:
        raise ValueError(f"katz_centrality: rounds must be >= 1, got {rounds}")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
         .distinct().persist())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    x = nodes.select("node", F.lit(0).cast("long").alias("katz_fp"))
    for _ in range(rounds):
        contrib = (
            e.join(x.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr(
                f"({alpha_ppm} * ({KATZ_S} + katz_fp)) div {KATZ_S}")
                .alias("c")))
        inflow = contrib.groupBy("dst").agg(
            F.sum("c").cast("long").alias("inflow"))
        x = round_checkpoint(
            nodes.join(inflow.withColumnRenamed("dst", "node"),
                       "node", "left")
            .select("node", F.coalesce("inflow", F.lit(0)).cast("long")
                    .alias("katz_fp")),
            checkpoint_dir)
    for handle in (e, nodes):
        handle.unpersist()
    return x


def katz_oracle_sql(edges_sql: str, alpha_ppm: int = 50_000,
                    rounds: int = 3) -> str:
    """DuckDB twin of :func:`katz_centrality`. ``edges_sql`` must
    yield (src, dst). The left-join-per-round form needs the
    no-in-edge guard (a bare left join would hand every such node one
    phantom alpha term); sums cast to BIGINT (HUGEINT class)."""
    s = KATZ_S
    parts = [
        f"e as materialized (select distinct src, dst from ({edges_sql})"
        " where src is not null and dst is not null)",
        "n0 as materialized (select distinct node from"
        " (select src as node from e union select dst from e))",
        "x0 as materialized (select node, cast(0 as bigint) as x from n0)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"x{k} as materialized ("
            f" select n.node, cast(coalesce(sum(case when e.src is null"
            f" then 0 else ({alpha_ppm} * ({s} + p.x)) // {s} end), 0)"
            f" as bigint) as x"
            f" from n0 n left join e on e.dst = n.node"
            f" left join x{k - 1} p on p.node = e.src"
            f" group by n.node)")
    return ("with " + ",\n".join(parts)
            + f"\nselect node, x as katz_fp from x{rounds}")


def bipartite_project(
    edges: DataFrame,
    left: str = "src",
    right: str = "dst",
    max_left_degree: int = 1024,
) -> DataFrame:
    """Weighted one-mode projection of a bipartite graph onto its
    RIGHT vertex set — the market-basket/co-occurrence primitive
    (parts co-ordered, tools co-invoked in a conversation, entities
    co-mentioned): ``(v1, v2, weight, overlap_ppm)`` with v1 < v2,
    weight = |common left neighbors| and overlap_ppm the Szymkiewicz-
    Simpson coefficient weight/min(deg v1, deg v2) in exact ppm
    (pmod floor).

    Scale contract: a left vertex of degree d contributes C(d,2)
    pairs — quadratic on hubs, the classic projection blowup. Left
    vertices with degree > ``max_left_degree`` are EXCLUDED from pair
    generation (they carry almost no co-occurrence signal and all of
    the cost; same cap discipline as the dedup band caps — audit the
    drop with one filter on the degree table). Right-degrees for the
    overlap denominator still count ALL edges, so the coefficient
    stays honest about capped mass. One dedup shuffle, one degree agg, one self-join on
    the left key (AQE splits residual skew), one pair agg.
    """
    e = (edges.select(F.col(left).alias("u"), F.col(right).alias("v"))
         .where(F.col(left).isNotNull() & F.col(right).isNotNull())
         .distinct())
    ldeg = e.groupBy("u").agg(F.count("*").alias("ld"))
    rdeg = e.groupBy("v").agg(F.count("*").alias("rd"))
    ok = e.join(ldeg.where(F.col("ld") <= max_left_degree), "u")
    pairs = (ok.alias("a")
             .join(ok.alias("b"), "u")
             .where(F.col("a.v") < F.col("b.v"))
             .groupBy(F.col("a.v").alias("v1"), F.col("b.v").alias("v2"))
             .agg(F.count("*").cast("long").alias("weight")))
    num = F.col("weight") * 1_000_000
    den = F.least(F.col("d1"), F.col("d2"))
    return (pairs
            .join(rdeg.select(F.col("v").alias("v1"),
                              F.col("rd").alias("d1")), "v1")
            .join(rdeg.select(F.col("v").alias("v2"),
                              F.col("rd").alias("d2")), "v2")
            .select("v1", "v2", "weight",
                    ((num - F.pmod(num, den)) / den).cast("long")
                    .alias("overlap_ppm")))


def bipartite_project_oracle_sql(edges_sql: str,
                                 max_left_degree: int = 1024) -> str:
    """DuckDB twin of :func:`bipartite_project`; ``edges_sql`` yields
    (u, v). Counts cast to BIGINT; `//` replays the pmod floor."""
    return f"""
with e as materialized (
  select distinct u, v from ({edges_sql})
  where u is not null and v is not null),
ld as (select u, count(*) as ld from e group by u),
rd as materialized (select v, cast(count(*) as bigint) as rd
                    from e group by v),
ok as materialized (
  select e.u, e.v from e join ld using (u)
  where ld.ld <= {max_left_degree}),
p as (
  select a.v as v1, b.v as v2, cast(count(*) as bigint) as weight
  from ok a join ok b using (u)
  where a.v < b.v group by a.v, b.v)
select p.v1, p.v2, p.weight,
       cast((p.weight * 1000000) // least(r1.rd, r2.rd) as bigint)
         as overlap_ppm
from p join rd r1 on r1.v = p.v1 join rd r2 on r2.v = p.v2
"""


def dyad_census(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Holland-Leinhardt dyad census of a directed graph — ONE row
    ``(n_nodes, n_edges, n_mutual, n_asym, n_null, reciprocity_ppm)``:
    mutual = unordered pairs linked both ways, asym = exactly one way,
    null = C(n,2) − mutual − asym, reciprocity = 2M/(2M+A) in exact
    ppm (the fraction of directed edges whose reverse exists — the
    first structural signature of a conversation/citation graph:
    reply networks are reciprocal, citation DAGs are not).

    Shape: dedup, canonicalize each edge to its unordered pair (min,
    max endpoint), ONE partial-agg count per pair (1 or 2 directions),
    one global agg. Self-loops are dropped (a dyad is two distinct
    nodes). C(n,2) is computed as n(n−1) div 2 in int64 — fine to
    ~10^9 nodes, and ANSI makes the overflow loud past that.
    """
    e = (edges.select(F.col(src).cast("string").alias("a"),
                      F.col(dst).cast("string").alias("b"))
         .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
         .where(F.col("a") != F.col("b"))
         .distinct())
    nodes = (e.select(F.col("a").alias("n"))
             .union(e.select(F.col("b").alias("n"))).distinct())
    pair = (e.select(F.least("a", "b").alias("lo"),
                     F.greatest("a", "b").alias("hi"))
            .groupBy("lo", "hi").agg(F.count("*").alias("d")))
    cnt = pair.agg(
        F.sum(F.when(F.col("d") == 2, 1).otherwise(0)).cast("long")
        .alias("n_mutual"),
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).cast("long")
        .alias("n_asym"))
    nn = nodes.agg(F.count("*").cast("long").alias("n_nodes"))
    num = F.lit(2_000_000) * F.col("n_mutual")
    den = 2 * F.col("n_mutual") + F.col("n_asym")
    return (cnt.crossJoin(nn)
            .select(
                "n_nodes",
                # identity: every unordered pair contributes its
                # direction count, so |E| = 2M + A — no extra scan
                (2 * F.col("n_mutual") + F.col("n_asym")).cast("long")
                .alias("n_edges"),
                "n_mutual", "n_asym",
                (F.expr("n_nodes * (n_nodes - 1) div 2")
                 - F.col("n_mutual") - F.col("n_asym")).cast("long")
                .alias("n_null"),
                F.when(den == 0, F.lit(0)).otherwise(
                    (num - F.pmod(num, den)) / den).cast("long")
                .alias("reciprocity_ppm")))


def dyad_census_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin of :func:`dyad_census`; ``edges_sql`` yields
    (src, dst)."""
    return f"""
with e as materialized (
  select distinct cast(src as varchar) as a, cast(dst as varchar) as b
  from ({edges_sql})
  where src is not null and dst is not null
    and cast(src as varchar) <> cast(dst as varchar)),
p as (
  select least(a, b) as lo, greatest(a, b) as hi, count(*) as d
  from e group by least(a, b), greatest(a, b)),
c as (
  select cast(sum(case when d = 2 then 1 else 0 end) as bigint)
           as n_mutual,
         cast(sum(case when d = 1 then 1 else 0 end) as bigint)
           as n_asym
  from p),
nn as (select cast(count(*) as bigint) as n_nodes from
       (select a as n from e union select b from e))
select n_nodes,
       cast(2 * n_mutual + n_asym as bigint) as n_edges,
       n_mutual, n_asym,
       cast(n_nodes * (n_nodes - 1) // 2 - n_mutual - n_asym
            as bigint) as n_null,
       cast(case when 2 * n_mutual + n_asym = 0 then 0
            else (2000000 * n_mutual) // (2 * n_mutual + n_asym)
            end as bigint) as reciprocity_ppm
from c cross join nn
"""


def rich_club(
    edges: DataFrame,
    thresholds: list[int],
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Rich-club coefficient profile of an undirected graph: for each
    degree threshold t, φ(t) = |edges among nodes of degree > t| /
    C(n_rich, 2) in exact ppm — do the hubs of the entity/mention
    graph preferentially wire to EACH OTHER (a connectivity core the
    skew-handling layer must expect) or spread their edges thin?

    Shape: dedup + canonical orientation, one degree agg, each edge
    annotated ONCE with min(endpoint degrees), then both counts come
    from HISTOGRAMS (edges by min-degree, nodes by degree) joined to
    the bounded threshold list — per-threshold work is
    |distinct degrees| × |thresholds|, never another pass over the
    edges. φ undefined below 2 rich nodes → 0 with n_rich carried so
    the caller can tell 'no club' from 'empty club'.

    Returns ``(threshold, n_rich, e_rich, phi_ppm)``.
    """
    if not thresholds:
        raise ValueError("rich_club: empty threshold list")
    e = (edges.select(F.col(src).cast("string").alias("a"),
                      F.col(dst).cast("string").alias("b"))
         .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
         .where(F.col("a") != F.col("b"))
         .select(F.least("a", "b").alias("lo"),
                 F.greatest("a", "b").alias("hi"))
         .distinct())
    deg = (e.select(F.col("lo").alias("n"))
           .unionByName(e.select(F.col("hi").alias("n")))
           .groupBy("n").agg(F.count("*").cast("long").alias("d")))
    em = (e.join(deg.select(F.col("n").alias("lo"),
                            F.col("d").alias("d1")), "lo")
          .join(deg.select(F.col("n").alias("hi"),
                           F.col("d").alias("d2")), "hi")
          .select(F.least("d1", "d2").alias("m"))
          .groupBy("m").agg(F.count("*").cast("long").alias("c")))
    dh = deg.groupBy("d").agg(F.count("*").cast("long").alias("c"))
    spark = edges.sparkSession
    thr = spark.createDataFrame([(int(t),) for t in thresholds],
                                "threshold long")
    e_t = (thr.join(em, em["m"] > thr["threshold"], "left")
           .groupBy("threshold")
           .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long")
                .alias("e_rich")))
    n_t = (thr.join(dh, dh["d"] > thr["threshold"], "left")
           .groupBy("threshold")
           .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long")
                .alias("n_rich")))
    num = F.col("e_rich") * 2_000_000
    den = F.col("n_rich") * (F.col("n_rich") - 1)
    return (n_t.join(e_t, "threshold")
            .select("threshold", "n_rich", "e_rich",
                    F.when(F.col("n_rich") < 2, F.lit(0)).otherwise(
                        (num - F.pmod(num, den)) / den).cast("long")
                    .alias("phi_ppm")))


def rich_club_oracle_sql(edges_sql: str, thresholds: list[int]) -> str:
    """DuckDB twin of :func:`rich_club`; ``edges_sql`` yields
    (src, dst)."""
    tl = ", ".join(f"({int(t)})" for t in thresholds)
    return f"""
with e as materialized (
  select distinct least(a, b) as lo, greatest(a, b) as hi from (
    select cast(src as varchar) as a, cast(dst as varchar) as b
    from ({edges_sql})
    where src is not null and dst is not null)
  where a <> b),
deg as materialized (
  select n, cast(count(*) as bigint) as d from (
    select lo as n from e union all select hi from e) group by n),
em as materialized (
  select least(d1.d, d2.d) as m, cast(count(*) as bigint) as c
  from e join deg d1 on d1.n = e.lo join deg d2 on d2.n = e.hi
  group by least(d1.d, d2.d)),
dh as materialized (
  select d, cast(count(*) as bigint) as c from deg group by d),
thr as (select * from (values {tl}) t(threshold)),
et as (
  select thr.threshold,
         cast(coalesce(sum(em.c), 0) as bigint) as e_rich
  from thr left join em on em.m > thr.threshold
  group by thr.threshold),
nt as (
  select thr.threshold,
         cast(coalesce(sum(dh.c), 0) as bigint) as n_rich
  from thr left join dh on dh.d > thr.threshold
  group by thr.threshold)
select cast(nt.threshold as bigint) as threshold, nt.n_rich, et.e_rich,
       cast(case when nt.n_rich < 2 then 0
            else (et.e_rich * 2000000) // (nt.n_rich * (nt.n_rich - 1))
            end as bigint) as phi_ppm
from nt join et using (threshold)
"""


_TRIAD_MOTIFS = ["030T", "030C", "120D", "120U", "120C", "210", "300"]


def triad_motifs(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Closed-triad motif census of a directed graph — the seven
    Holland-Leinhardt triad types whose underlying triangle is
    complete (030T transitive, 030C cycle, 120D/120U/120C one-mutual,
    210, 300), the next structural signature after
    :func:`dyad_census`: feed-forward-heavy graphs (030T ≫ 030C) are
    hierarchies/DAG-ish tool pipelines, cycle- and mutual-heavy ones
    are conversational. Always emits all 7 rows (a zero cell is
    evidence, not absence).

    Shape: distinct directed edges collapse to canonical unordered
    pairs carrying two direction bits (fwd = lo→hi, bwd = hi→lo);
    triangles enumerate once on the undirected support via the
    degree-ordered wedge join (:func:`_enumerate_triangles`'s m^1.5
    bound); each triangle joins its three pair-bit rows back
    (broadcast-eligible only for small graphs — these are equi-joins
    on pair keys, shuffle-partitioned otherwise) and classifies with
    pure boolean arithmetic: m = #mutual dyads picks {300, 210,
    1-mutual, 0-mutual}; m=0 splits on the two cyclic orientations;
    m=1 on the third node's out-degree toward the mutual pair
    (2 → 120D "divergent", 0 → 120U "convergent", 1 → 120C — the
    igraph/MAN naming: 120D = A←B→C with A↔C). One final
    motif-sized agg.

    Returns ``(motif, n_triangles)``, 7 rows.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    e = (edges.select(F.col(src).cast("string").alias("u"),
                      F.col(dst).cast("string").alias("v"))
         .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
         .where(F.col("u") != F.col("v"))
         .distinct())
    pair = (e.select(F.least("u", "v").alias("a"),
                     F.greatest("u", "v").alias("b"),
                     (F.col("u") < F.col("v")).alias("isf"))
            .groupBy("a", "b").agg(
                F.max(F.col("isf").cast("int")).alias("f"),
                F.max((~F.col("isf")).cast("int")).alias("w")))
    tri = _enumerate_triangles(pair.select("a", "b"))

    def bits(lo, hi, fcol, wcol):
        p = pair.select(F.col("a").alias(lo), F.col("b").alias(hi),
                        F.col("f").alias(fcol), F.col("w").alias(wcol))
        return p

    t = (tri
         .join(bits("x", "y", "xy_f", "xy_b"), ["x", "y"])
         .join(bits("x", "z", "xz_f", "xz_b"), ["x", "z"])
         .join(bits("y", "z", "yz_f", "yz_b"), ["y", "z"]))
    m = ((F.col("xy_f") * F.col("xy_b"))
         + (F.col("xz_f") * F.col("xz_b"))
         + (F.col("yz_f") * F.col("yz_b")))
    cyc = (((F.col("xy_f") == 1) & (F.col("yz_f") == 1)
            & (F.col("xz_b") == 1))
           | ((F.col("xy_b") == 1) & (F.col("yz_b") == 1)
              & (F.col("xz_f") == 1)))
    # m=1: out-degree of the non-mutual node toward the mutual pair
    third_out = (
        F.when((F.col("xy_f") * F.col("xy_b")) == 1,   # mutual=xy, w=z
               F.col("xz_b") + F.col("yz_b"))
        .when((F.col("xz_f") * F.col("xz_b")) == 1,    # mutual=xz, w=y
              F.col("xy_b") + F.col("yz_f"))
        .otherwise(F.col("xy_f") + F.col("xz_f"))      # mutual=yz, w=x
    )
    motif = (F.when(m == 3, F.lit("300"))
             .when(m == 2, F.lit("210"))
             .when(m == 1,
                   F.when(third_out == 2, F.lit("120D"))
                   .when(third_out == 0, F.lit("120U"))
                   .otherwise(F.lit("120C")))
             .otherwise(F.when(cyc, F.lit("030C"))
                        .otherwise(F.lit("030T"))))
    counts = (t.select(motif.alias("motif"))
              .groupBy("motif").agg(F.count("*").cast("long")
                                    .alias("n")))
    frame = (edges.sparkSession.range(1)
             .select(F.explode(F.array(
                 *[F.lit(x) for x in _TRIAD_MOTIFS])).alias("motif")))
    return (frame.join(counts, "motif", "left")
            .select("motif",
                    F.coalesce("n", F.lit(0)).cast("long")
                    .alias("n_triangles")))


def triad_motifs_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin of :func:`triad_motifs`; ``edges_sql`` yields
    (src, dst)."""
    return f"""
with de as materialized (
  select distinct cast(src as varchar) as u, cast(dst as varchar) as v
  from ({edges_sql})
  where src is not null and dst is not null
    and cast(src as varchar) <> cast(dst as varchar)),
pair as materialized (
  select least(u, v) as a, greatest(u, v) as b,
         cast(max(case when u < v then 1 else 0 end) as int) as f,
         cast(max(case when u < v then 0 else 1 end) as int) as w
  from de group by 1, 2),
tri as materialized (
  select p1.a as x, p1.b as y, p2.b as z
  from pair p1
  join pair p2 on p2.a = p1.a and p2.b > p1.b
  join pair p3 on p3.a = p1.b and p3.b = p2.b),
lab as (
  select
    (exy.f * exy.w + exz.f * exz.w + eyz.f * eyz.w) as m,
    ((exy.f = 1 and eyz.f = 1 and exz.w = 1)
     or (exy.w = 1 and eyz.w = 1 and exz.f = 1)) as cyc,
    case when exy.f * exy.w = 1 then exz.w + eyz.w
         when exz.f * exz.w = 1 then exy.w + eyz.f
         else exy.f + exz.f end as third_out
  from tri
  join pair exy on exy.a = tri.x and exy.b = tri.y
  join pair exz on exz.a = tri.x and exz.b = tri.z
  join pair eyz on eyz.a = tri.y and eyz.b = tri.z),
cnt as (
  select case when m = 3 then '300'
              when m = 2 then '210'
              when m = 1 then (case when third_out = 2 then '120D'
                                    when third_out = 0 then '120U'
                                    else '120C' end)
              when cyc then '030C' else '030T' end as motif,
         cast(count(*) as bigint) as n
  from lab group by 1)
select motif, cast(coalesce(n, 0) as bigint) as n_triangles
from (values ('030T'), ('030C'), ('120D'), ('120U'), ('120C'),
             ('210'), ('300')) fr(motif)
left join cnt using (motif)
"""


EIG_SCALE = 1_000_000  # eigenvector fixed-point scale (ppm)


def eigenvector_centrality(
    edges: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Truncated eigenvector centrality (power iteration), integer
    exact: start at x = EIG_SCALE everywhere, then K rounds of

        y(v) = Σ_{u→v} x(u);   x'(v) = (y(v) · EIG_SCALE) div max(y)

    — the ∞-norm-normalized power step, so the most-central node
    always reads exactly EIG_SCALE and everything else is its ppm
    fraction. The measure PageRank's teleport deliberately distorts
    and Katz's additive term floors: pure "you are central because
    your in-neighbors are central", the right axis for vocabulary /
    entity-prestige graphs where mass conservation is not wanted.

    DAG-collapse rule (exact, both engines): a graph whose walks die
    out (no cycles reachable) drives max(y) to 0 in ≤ diameter
    rounds; from there every x is 0 — the true limit — and the loop
    SHORT-CIRCUITS rather than dividing by zero. The twin replays the
    same rule as a CASE on the per-round max.

    Overflow contract: y ≤ indeg_max·EIG_SCALE and the normalization
    multiplies by EIG_SCALE before dividing, so indeg_max must stay
    below ~9.2·10^6 (int64 / 10^12); ANSI aborts loudly past it.

    Per round: one edge⋈rank join + partial-agg sum (node-sized,
    persisted for its two consumers — the max probe and the update),
    a 1-row max collect (bounded), a node-sized left join, lineage
    cut via round_checkpoint — the katz/pagerank loop shape; edges
    and nodes persist for the loop and are released before returning.
    Returns (node, eig_fp).
    """
    if rounds < 1:
        raise ValueError(
            f"eigenvector_centrality: rounds must be >= 1, got {rounds}")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
         .distinct().persist())
    if e.isEmpty():
        e.unpersist()
        id_type = edges.schema[src].dataType.simpleString()
        return edges.sparkSession.createDataFrame(
            [], f"node {id_type}, eig_fp long")
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    x = nodes.select(
        "node", F.lit(EIG_SCALE).cast("long").alias("eig_fp"))
    dead = False
    for _ in range(rounds):
        inflow = (
            e.join(x.withColumnRenamed("node", "src"), "src")
            .groupBy("dst").agg(F.sum("eig_fp").cast("long")
                                .alias("inflow"))
            .persist())
        m = inflow.agg(F.max("inflow")).collect()[0][0] or 0
        if m == 0:
            inflow.unpersist()
            dead = True
            break
        x = round_checkpoint(
            nodes.join(inflow.withColumnRenamed("dst", "node"),
                       "node", "left")
            .select("node", F.expr(
                f"(coalesce(inflow, 0) * {EIG_SCALE}) div {m}")
                .cast("long").alias("eig_fp")),
            checkpoint_dir)
        inflow.unpersist()
    if dead:
        x = nodes.select("node", F.lit(0).cast("long").alias("eig_fp"))
    for handle in (e, nodes):
        handle.unpersist()
    return x


def eigenvector_oracle_sql(edges_sql: str, rounds: int = 4) -> str:
    """DuckDB twin of :func:`eigenvector_centrality`. ``edges_sql``
    must yield (src, dst). One CTE chain per round (aggregates can't
    ride a recursive CTE); the DAG-collapse short-circuit replays as
    a CASE on the round's max — once a max hits 0 every later round
    stays 0, which is exactly the short-circuited fixture."""
    s = EIG_SCALE
    parts = [
        f"e as materialized (select distinct src, dst from ({edges_sql})"
        " where src is not null and dst is not null)",
        "n0 as materialized (select distinct node from"
        " (select src as node from e union select dst from e))",
        f"x0 as materialized (select node, cast({s} as bigint) as x"
        " from n0)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"y{k} as materialized (select n0.node,"
            f" cast(coalesce(s.i, 0) as bigint) as y from n0"
            f" left join (select e.dst, sum(x{k - 1}.x) as i from e"
            f" join x{k - 1} on x{k - 1}.node = e.src group by e.dst)"
            " s on s.dst = n0.node)")
        parts.append(
            f"m{k} as (select max(y) as m from y{k})")
        parts.append(
            f"x{k} as materialized (select node,"
            f" cast(case when (select m from m{k}) = 0 then 0"
            f" else (y * {s}) // (select m from m{k}) end as bigint)"
            f" as x from y{k})")
    body = ",\n".join(parts)
    return (f"with {body}\n"
            f"select node, cast(x as bigint) as eig_fp "
            f"from x{rounds}")


def hub_ablation(
    edges: DataFrame,
    k: int = 10,
    src: str = "src",
    dst: str = "dst",
    cc_local_threshold: int = 100_000,
) -> DataFrame:
    """Hub-removal robustness probe: how much of the graph's largest
    connected component survives deleting the top-``k``
    highest-degree nodes — the scale-free-network fragility question
    for an entity graph (a KG whose connectivity lives in a handful
    of celebrity entities degrades catastrophically under exactly the
    canonicalization merges/splits those hubs attract; a robust one
    doesn't). Complements :func:`graph_mixing` (who links to whom)
    and the k-core profile (where density lives) with the
    counterfactual: remove the hubs and measure.

    Deterministic: hubs are the top-k by (degree DESC, node ASC) —
    the id tiebreak pins the set when degrees tie. Undirected,
    self-loops dropped. Returns one row ``(n_nodes, n_edges, k_used,
    lcc_before, lcc_after, retained_ppm)`` where retained =
    lcc_after·10⁶ div lcc_before (nodes in the post-ablation largest
    component, counted over the surviving n_nodes − k_used nodes; an
    empty post-ablation graph reports 0).

    Scale shape: degrees = one partial agg; the hub set is k rows
    (broadcast back as an anti-join filter); each LCC is one
    :func:`~cow_spark.operators.canon.connected_components` run —
    the iterative cost is the honest price, paid twice by design.
    ``cc_local_threshold`` forwards to CC's driver-side union-find
    for sub-threshold graphs (bit-identical output by CC's own pin;
    the pagerank default) — two distributed iterative runs over a
    vocabulary-sized fixture graph were pure scheduler overhead
    (measured 17 s → ~2 s at sf0.01); pass 0 to force distributed.
    No reference counterpart; extension family SURVEY.md §2.11.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from .canon import connected_components

    e = (edges.select(F.col(src).cast("string").alias("a"),
                      F.col(dst).cast("string").alias("b"))
         .where(F.col(src).isNotNull() & F.col(dst).isNotNull()
                & (F.col(src).cast("string")
                   != F.col(dst).cast("string")))
         .select(F.least("a", "b").alias("a"),
                 F.greatest("a", "b").alias("b"))
         .dropDuplicates().persist())
    deg = (e.select(F.col("a").alias("n"))
           .union(e.select(F.col("b").alias("n")))
           .groupBy("n").agg(F.count("*").alias("d")))
    hubs = (deg.orderBy(F.col("d").desc(), F.col("n").asc())
            .limit(int(k)).select("n").persist())
    n_nodes = deg.count()
    n_edges = e.count()
    k_used = hubs.count()

    def lcc(edge_df) -> int:
        cc = connected_components(
            edge_df.select(F.col("a").alias("src"),
                           F.col("b").alias("dst")),
            local_threshold=cc_local_threshold)
        top = (cc.groupBy("component").agg(F.count("*").alias("c"))
               .agg(F.max("c").alias("m")).collect())
        return int(top[0]["m"]) if top and top[0]["m"] is not None else 0

    before = lcc(e)
    ha = hubs.select(F.col("n").alias("a"))
    hb = hubs.select(F.col("n").alias("b"))
    survived = (e.join(ha, "a", "left_anti")
                .join(hb, "b", "left_anti"))
    after = lcc(survived)
    e.unpersist(), hubs.unpersist()
    spark = edges.sparkSession
    ret = (after * 1_000_000) // before if before else 0
    return spark.createDataFrame(
        [(int(n_nodes), int(n_edges), int(k_used), int(before),
          int(after), int(ret))],
        "n_nodes long, n_edges long, k_used long, lcc_before long, "
        "lcc_after long, retained_ppm long")


def hub_ablation_oracle_sql(edges_sql: str, k: int = 10) -> str:
    """DuckDB twin of :func:`hub_ablation`; ``edges_sql`` yields
    ``(a, b)``. Two recursive min-label propagations share one WITH
    RECURSIVE block; the sibling-CTE union-poison gotcha doesn't bite
    because each recursive CTE uses plain UNION internally only."""
    return f"""
with recursive base as (
  select distinct least(ca, cb) as a, greatest(ca, cb) as b
  from (select cast(a as varchar) as ca, cast(b as varchar) as cb
        from ({edges_sql})
        where a is not null and b is not null)
  where ca <> cb),
deg as (
  select n, count(*) as d from (
    select a as n from base union all select b as n from base)
  group by n),
hubs as materialized (
  select n from deg order by d desc, n asc limit {int(k)}),
surv as materialized (
  select a, b from base
  where a not in (select n from hubs)
    and b not in (select n from hubs)),
e1 as (select a as s, b as t from base
       union all select b, a from base),
r1(node, label) as (
  select s, s from e1
  union
  select e1.t, r1.label from e1 join r1 on e1.s = r1.node
  where r1.label < e1.t),
e2 as (select a as s, b as t from surv
       union all select b, a from surv),
r2(node, label) as (
  select s, s from e2
  union
  select e2.t, r2.label from e2 join r2 on e2.s = r2.node
  where r2.label < e2.t),
lcc1 as (
  select coalesce(max(c), 0) as m from (
    select count(*) as c from (
      select node, min(label) as comp from r1 group by node)
    group by comp)),
lcc2 as (
  select coalesce(max(c), 0) as m from (
    select count(*) as c from (
      select node, min(label) as comp from r2 group by node)
    group by comp))
select cast((select count(*) from deg) as bigint) as n_nodes,
       cast((select count(*) from base) as bigint) as n_edges,
       cast((select count(*) from hubs) as bigint) as k_used,
       cast(lcc1.m as bigint) as lcc_before,
       cast(lcc2.m as bigint) as lcc_after,
       cast(case when lcc1.m > 0
            then (lcc2.m * 1000000) // lcc1.m else 0 end as bigint)
         as retained_ppm
from lcc1 cross join lcc2
"""
