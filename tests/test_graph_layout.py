"""Round-3 batch: multi-source BFS shortest paths, incremental CC
maintenance, SPARQL MINUS, and Z-order layout keys — each vs an exact
twin (pure-Python, from-scratch CC, spec-case table, or DuckDB)."""

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cow_spark.functions.zorder import (bucketize, write_zordered, zvalue,
                                        zvalue_sql)
from cow_spark.model import QUAD_SCHEMA
from cow_spark.operators.canon import (connected_components,
                                       incremental_components)
from cow_spark.operators.graphrank import shortest_paths, shortest_paths_py
from cow_spark.plans.bgp import ask_bgp, match_bgp, minus_bgp, values_clause

EDGE_SCHEMA = T.StructType([T.StructField("src", T.StringType()),
                            T.StructField("dst", T.StringType())])


def _edges(spark, pairs):
    return spark.createDataFrame([(a, b) for a, b in pairs], EDGE_SCHEMA)


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], ["node"])


# ---------------------------------------------------------------------------
# shortest_paths
# ---------------------------------------------------------------------------

# chain a-b-c-d-e, branch c-f, cycle f-g-a, island x-y, isolate via seed
_GRAPH = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("c", "f"),
          ("f", "g"), ("g", "a"), ("x", "y"),
          ("dup", "dup"), (None, "z"), ("b", "a")]


def _bfs(spark, seeds, hops):
    got = shortest_paths(_edges(spark, _GRAPH), _seeds(spark, seeds),
                         max_hops=hops)
    return sorted((r["node"], r["dist"]) for r in got.collect())


def test_bfs_matches_python_twin(spark):
    for seeds, hops in [(["a"], 6), (["a", "x"], 3), (["e"], 1),
                        (["c", "g"], 2)]:
        assert _bfs(spark, seeds, hops) == shortest_paths_py(
            _GRAPH, seeds, max_hops=hops)


def test_bfs_min_dist_via_cycle(spark):
    # g is 1 hop from a via the cycle edge, not 3 via the chain
    assert ("g", 1) in _bfs(spark, ["a"], 6)
    assert ("e", 4) in _bfs(spark, ["a"], 6)


def test_bfs_early_exit_and_cap(spark):
    full = _bfs(spark, ["a"], 20)           # diameter-bounded, exits early
    assert full == _bfs(spark, ["a"], 4)    # radius of a's component is 4
    assert {n for n, _ in full} == {"a", "b", "c", "d", "e", "f", "g"}
    assert _bfs(spark, ["a"], 1) == [("a", 0), ("b", 1), ("g", 1)]


def test_bfs_unknown_seed_is_isolated(spark):
    assert _bfs(spark, ["ghost"], 3) == [("ghost", 0)]


def test_bfs_rejects_zero_hops(spark):
    with pytest.raises(ValueError):
        shortest_paths(_edges(spark, _GRAPH), _seeds(spark, ["a"]),
                       max_hops=0)


# ---------------------------------------------------------------------------
# incremental_components
# ---------------------------------------------------------------------------

def _labels(df):
    return sorted((r["node"], r["component"]) for r in df.collect())


def _incremental_equals_scratch(spark, old, delta):
    base = connected_components(_edges(spark, old))
    got = incremental_components(base, _edges(spark, delta))
    want = connected_components(_edges(spark, old + delta))
    assert _labels(got) == _labels(want)
    return _labels(got)


def test_incremental_merges_components(spark):
    # two components {a,b,c} {p,q} merged by one delta edge
    _incremental_equals_scratch(
        spark, [("a", "b"), ("b", "c"), ("p", "q")], [("c", "p")])


def test_incremental_brand_new_nodes(spark):
    # delta introduces a disjoint new component and extends an old one
    out = _incremental_equals_scratch(
        spark, [("a", "b")], [("m", "n"), ("b", "z")])
    assert ("m", "m") in out and ("n", "m") in out


def test_incremental_noop_edge_inside_component(spark):
    base = connected_components(_edges(spark, [("a", "b"), ("b", "c")]))
    got = incremental_components(base, _edges(spark, [("a", "c")]))
    assert _labels(got) == _labels(base)


def test_incremental_chain_of_merges(spark):
    # one delta edge chains three old components through a new hub node
    _incremental_equals_scratch(
        spark, [("a", "b"), ("p", "q"), ("x", "y")],
        [("hub", "a"), ("hub", "p"), ("hub", "x")])


# ---------------------------------------------------------------------------
# hyperball
# ---------------------------------------------------------------------------

def test_hyperball_matches_exact_ball_sketches(spark):
    # register propagation == sketching each exact BFS ball directly
    # (the lossless-merge invariant regs_t(v) == sketch(ball(v, t)))
    from cow_spark.operators.graphrank import hyperball, hyperball_py

    nf = hyperball(_edges(spark, _GRAPH), rounds=3, b=4)
    got = sorted(tuple(r) for r in nf.collect())
    assert got == [tuple(x) for x in hyperball_py(_GRAPH, rounds=3, b=4)]
    # radius 0: every node's own ball is {node}, est exactly 1
    assert all(r[3] == 1 for r in got if r[1] == 0)


def test_hyperball_estimates_are_monotone_and_converge(spark):
    from cow_spark.operators.graphrank import hyperball

    # chain a-b-c-d-e plus island: ball sizes grow then saturate
    nf = hyperball(_edges(spark, _GRAPH), rounds=6, b=6).collect()
    by_node = {}
    for r in nf:
        by_node.setdefault(r["node"], {})[r["radius"]] = r["est"]
    for node, ests in by_node.items():
        seq = [ests[r] for r in sorted(ests)]
        assert seq == sorted(seq), (node, seq)  # registers only grow
    # island {x, y} saturates at its component
    assert by_node["x"][6] == by_node["x"][1]


def test_hyperball_closeness_orders_center_before_periphery(spark):
    from cow_spark.operators.graphrank import (hyperball,
                                               hyperball_closeness)

    # path graph: m is the center, a/e the ends
    path = [("a", "b"), ("b", "m"), ("m", "d"), ("d", "e")]
    cl = {r["node"]: (r["n_reached"], r["sum_dist"])
          for r in hyperball_closeness(
              hyperball(_edges(spark, path), rounds=4, b=6)).collect()}
    assert cl["m"][1] < cl["a"][1] and cl["m"][1] < cl["e"][1]
    assert len({v[0] for v in cl.values()}) == 1  # all reach everyone


def test_hyperball_rejects_zero_rounds(spark):
    from cow_spark.operators.graphrank import hyperball

    with pytest.raises(ValueError):
        hyperball(_edges(spark, _GRAPH), rounds=0)


# ---------------------------------------------------------------------------
# minus_bgp
# ---------------------------------------------------------------------------

_Q = [("g", "d:1", "v:lang", "lit", "en", None, None),
      ("g", "d:2", "v:lang", "lit", "fr", None, None),
      ("g", "d:3", "v:lang", "lit", "en", None, None),
      ("g", "d:1", "v:source", "lit", "src7", None, None),
      ("g", "d:2", "v:source", "lit", "web", None, None)]


def test_minus_removes_on_shared_var(spark):
    quads = spark.createDataFrame(_Q, QUAD_SCHEMA)
    b = match_bgp(quads, [("?doc", "v:lang", "?l")])
    got = minus_bgp(b, quads, [("?doc", "v:source", "src7")])
    assert sorted(r["doc"] for r in got.collect()) == ["d:2", "d:3"]


def test_minus_disjoint_domain_removes_nothing(spark):
    # SPARQL 1.1 §8.3: a MINUS group sharing no variable is incompatible
    # with every row — NOT EXISTS with the same group wipes everything.
    quads = spark.createDataFrame(_Q, QUAD_SCHEMA)
    b = match_bgp(quads, [("?doc", "v:lang", "?l")])
    minus = minus_bgp(b, quads, [("?x", "v:source", "src7")])
    assert minus.count() == b.count() == 3
    # the engine's NOT EXISTS refuses the same group by design
    with pytest.raises(ValueError, match="shares no variable"):
        match_bgp(quads, [("?doc", "v:lang", "?l")],
                  not_exists=[("?x", "v:source", "src7")])


def test_minus_null_shared_vars(spark):
    # left rows carrying OPTIONAL NULLs: unbound is compatible with
    # anything but contributes nothing to the domain intersection
    quads = spark.createDataFrame(_Q, QUAD_SCHEMA)
    b = spark.createDataFrame(
        [("d:1", None), (None, None), ("d:9", None), ("d:2", "fr")],
        T.StructType([T.StructField("doc", T.StringType()),
                      T.StructField("l", T.StringType())]))
    got = minus_bgp(b, quads, [("?doc", "v:lang", "?l")])
    rows = sorted((r["doc"], r["l"]) for r in got.collect()
                  if r["doc"] is not None or r["l"] is not None)
    nulls = [r for r in got.collect()
             if r["doc"] is None and r["l"] is None]
    # (d:1, NULL): doc bound+matching, NULL l compatible -> removed
    # (d:2, fr): exact match -> removed
    # (d:9, NULL): no right row with doc=d:9 -> survives
    # (NULL, NULL): all shared vars unbound -> survives outright
    assert rows == [("d:9", None)]
    assert len(nulls) == 1


# ---------------------------------------------------------------------------
# Z-order
# ---------------------------------------------------------------------------

def _morton_py(vals, bits):
    out = 0
    d = len(vals)
    for j, v in enumerate(vals):
        v &= (1 << bits) - 1
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * d + j)
    return out


def test_zvalue_matches_python_twin(spark):
    pts = [(x, y, z) for x in (0, 1, 5, 250, 255)
           for y in (0, 3, 128, 255) for z in (0, 7, 255)]
    df = spark.createDataFrame(pts, ["x", "y", "z"])
    got = df.select(
        "x", "y", "z",
        zvalue([F.col("x"), F.col("y"), F.col("z")], bits=8).alias("zk"))
    for r in got.collect():
        assert r["zk"] == _morton_py([r["x"], r["y"], r["z"]], 8)


def test_zvalue_sql_parity(spark):
    pts = [(x, y) for x in range(0, 1024, 37) for y in (0, 17, 1023)]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = {(r["x"], r["y"]): r["zk"] for r in df.select(
        "x", "y", zvalue([F.col("x"), F.col("y")], bits=10).alias("zk"))
        .collect()}
    con = duckdb.connect()
    sql = zvalue_sql(["x", "y"], bits=10)
    for (x, y), zk in got.items():
        assert con.execute(
            f"select {sql} from (select {x} as x, {y} as y)"
        ).fetchone()[0] == zk


def test_zvalue_masks_out_of_range(spark):
    df = spark.createDataFrame([(1 << 12,)], ["x"])
    r = df.select(zvalue([F.col("x")], bits=8).alias("zk")).first()
    assert r["zk"] == 0  # wrapped into the 8-bit lane, no cross-lane bleed


def test_zvalue_validates_width():
    with pytest.raises(ValueError):
        zvalue([], bits=8)
    with pytest.raises(ValueError):
        zvalue([F.col("a"), F.col("b")], bits=32)  # 64 > 63


def test_bucketize_clamps_and_scales(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (900.0,)], ["v"])
    got = [r[0] for r in df.select(
        bucketize(F.col("v"), 0.0, 100.0, bits=4)).collect()]
    assert got == [0, 0, 7, 15, 15]


def test_write_zordered_gives_every_dim_locality(spark, tmp_path):
    # uniform 32x32 grid -> with 4 range-partitioned files, every file
    # must cover a strict sub-range of BOTH dims (a single-key sort
    # would leave the second dim spanning the full domain in each file)
    grid = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], ["x", "y"])
    path = str(tmp_path / "zordered")
    write_zordered(grid, path, ["x", "y"], bits=5, n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 1024
    stats = (back.withColumn("f", F.input_file_name())
             .groupBy("f")
             .agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
                  F.min("y").alias("y0"), F.max("y").alias("y1"))
             .collect())
    assert len(stats) > 1
    for r in stats:
        assert r["x1"] - r["x0"] < 31 or r["y1"] - r["y0"] < 31
    # and at least one file prunes on each dimension alone
    assert any(r["x1"] - r["x0"] < 31 for r in stats)
    assert any(r["y1"] - r["y0"] < 31 for r in stats)


# ---------------------------------------------------------------------------
# values_clause / ask_bgp
# ---------------------------------------------------------------------------


def test_values_filters_and_extends(spark):
    quads = spark.createDataFrame(_Q, QUAD_SCHEMA)
    b = match_bgp(quads, [("?doc", "v:lang", "?l")])
    got = values_clause(b, [{"l": "en", "tier": "hi"},
                            {"l": "de", "tier": "lo"}])
    rows = sorted((r["doc"], r["l"], r["tier"]) for r in got.collect())
    assert rows == [("d:1", "en", "hi"), ("d:3", "en", "hi")]


def test_values_undef_is_wildcard(spark):
    quads = spark.createDataFrame(_Q, QUAD_SCHEMA)
    b = match_bgp(quads, [("?doc", "v:lang", "?l")])
    # missing key and explicit None are both UNDEF: match every row
    got = values_clause(b, [{"l": "fr", "tier": "x"},
                            {"tier": "any"}])
    rows = sorted((r["doc"], r["l"], r["tier"]) for r in got.collect())
    assert rows == [("d:1", "en", "any"), ("d:2", "fr", "any"),
                    ("d:2", "fr", "x"), ("d:3", "en", "any")]


def test_values_no_shared_vars_cross_joins(spark):
    quads = spark.createDataFrame(_Q, QUAD_SCHEMA)
    b = match_bgp(quads, [("?doc", "v:lang", "?l")])
    got = values_clause(b, [{"k": "a"}, {"k": "b"}, {"k": "a"}])
    assert got.count() == 6  # 3 bindings x 2 distinct VALUES rows
    assert set(got.columns) == {"doc", "l", "k"}


def test_values_fills_unbound_left_var(spark):
    # SPARQL join semantics: an unbound binding-side var is compatible
    # and the merged solution takes the VALUES side's value
    b = spark.createDataFrame(
        [("d:1", None), ("d:2", "fr")],
        T.StructType([T.StructField("doc", T.StringType()),
                      T.StructField("l", T.StringType())]))
    got = values_clause(b, [{"l": "en"}, {"l": "fr"}])
    rows = sorted((r["doc"], r["l"]) for r in got.collect())
    assert rows == [("d:1", "en"), ("d:1", "fr"), ("d:2", "fr")]


def test_values_rejects_bad_input(spark):
    quads = spark.createDataFrame(_Q, QUAD_SCHEMA)
    b = match_bgp(quads, [("?doc", "v:lang", "?l")])
    with pytest.raises(ValueError, match="at least one row"):
        values_clause(b, [])
    with pytest.raises(ValueError, match="bind no variables"):
        values_clause(b, [{}])
    with pytest.raises(ValueError, match="without the '\\?'"):
        values_clause(b, [{"?l": "en"}])


def test_ask_true_false_and_constant(spark):
    quads = spark.createDataFrame(_Q, QUAD_SCHEMA)
    hit = ask_bgp(quads, [("?doc", "v:lang", "en")])
    assert [r["matched"] for r in hit.collect()] == [True]
    miss = ask_bgp(quads, [("?doc", "v:lang", "zz")])
    assert miss.columns == ["matched"] and miss.count() == 0
    # all-constant pattern group reuses the engine's gate convention
    const = ask_bgp(quads, [("d:1", "v:lang", "en")])
    assert [r["matched"] for r in const.collect()] == [True]


def test_ask_conjunction(spark):
    quads = spark.createDataFrame(_Q, QUAD_SCHEMA)
    got = ask_bgp(quads, [("?d", "v:lang", "en"),
                          ("?d", "v:source", "src7")])
    assert [r["matched"] for r in got.collect()] == [True]
    none = ask_bgp(quads, [("?d", "v:lang", "fr"),
                           ("?d", "v:source", "src7")])
    assert none.count() == 0
