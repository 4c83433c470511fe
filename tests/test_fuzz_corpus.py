"""Hypothesis fuzz for the corpus operators: properties that must hold
on ARBITRARY input, checked against pure-Python twins. Spark runs once
per property over a batched corpus (one job per case would be
minutes); hypothesis drives the corpus generation, the assertion loops
per document."""

import os
import re
import string
import sys

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cow_spark.operators.corpus import pack_sequences
from cow_spark.operators.pii import PII_PATTERNS, pii_scan

_TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " .-@#\n\t:/",
    max_size=120)


@settings(max_examples=12, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=25))
def test_pii_scan_matches_python_re_on_random_text(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_scan(df).collect()}
    for i, t in enumerate(texts):
        red = t
        for name, pat, tag in PII_PATTERNS:
            assert got[i][f"n_{name}"] == len(re.findall(pat, t)), (i, name)
            red = re.sub(pat, tag.replace("\\", "\\\\"), red)
        assert got[i]["redacted"] == red, i


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=400),
                min_size=1, max_size=40),
       st.integers(min_value=1, max_value=64))
def test_pack_sequences_invariants_on_random_lengths(spark, lens, ctx):
    docs = spark.createDataFrame(
        [(i, "w " * n) for i, n in enumerate(lens)],
        "doc_id long, text string")
    rows = sorted(pack_sequences(docs, context=ctx, n_shards=3).collect(),
                  key=lambda r: (r["shard"], r["doc_id"]))
    offs: dict = {}
    for r in rows:
        off = offs.get(r["shard"], 0)
        assert r["n_tokens"] == lens[r["doc_id"]]
        assert r["start_off"] == off
        end = off + r["n_tokens"]
        assert r["bin_first"] == off // ctx
        assert r["bin_last"] == max((end - 1) // ctx, off // ctx)
        assert r["n_bins"] == r["bin_last"] - r["bin_first"] + 1
        offs[r["shard"]] = end
    assert len(rows) == len(lens)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 3),           # key
                       st.integers(0, 50)),         # left ts (seconds)
            min_size=1, max_size=20),
    st.lists(st.tuples(st.integers(0, 3),           # key
                       st.integers(0, 50),          # right ts
                       st.integers(0, 9)),          # payload/tiebreak
            min_size=0, max_size=20),
    st.one_of(st.none(), st.integers(1, 20)),       # tolerance seconds
)
def test_asof_join_matches_pandas_merge_asof(spark, lefts, rights, tol_s):
    """asof_join's docstring names pandas merge_asof(direction=backward,
    allow_exact_matches=True) as its semantics twin — hold it to that on
    arbitrary keyed timelines, including duplicate timestamps on the
    left and a tolerance window. Right-side (key, ts) duplicates are
    collapsed to the max payload first: merge_asof breaks such ties by
    input position while asof_join guarantees greatest-right_order, so
    the comparison pins the documented deterministic tie rule."""
    import datetime as dt

    import pandas as pd

    from cow_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(i, f"k{k}", base + dt.timedelta(seconds=ts))
         for i, (k, ts) in enumerate(lefts)],
        "event_id long, user_id string, ts timestamp")
    best = {}
    for k, ts, v in rights:
        best[(k, ts)] = max(best.get((k, ts), -1), v)
    rrows = [(f"k{k}", base + dt.timedelta(seconds=ts), v)
             for (k, ts), v in sorted(best.items())]
    rdf = spark.createDataFrame(
        rrows if rrows else [("k-none", base, 0)],
        "user_id string, ts timestamp, payload long")

    tol_us = tol_s * 1_000_000 if tol_s else None
    got = {r["event_id"]: r["asof_payload"]
           for r in asof_join(ldf, rdf, on="user_id",
                              right_cols=["payload"],
                              right_order="payload",
                              tolerance_us=tol_us).collect()}

    lp = pd.DataFrame(
        [(i, f"k{k}", base + dt.timedelta(seconds=ts))
         for i, (k, ts) in enumerate(lefts)],
        columns=["event_id", "user_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(
        rrows if rrows else [("k-none", base, 0)],
        columns=["user_id", "ts", "payload"]).sort_values("ts")
    kwargs = {"tolerance": pd.Timedelta(seconds=tol_s)} if tol_s else {}
    m = pd.merge_asof(lp, rp, on="ts", by="user_id",
                      direction="backward", allow_exact_matches=True,
                      **kwargs)
    want = {int(r.event_id): (None if pd.isna(r.payload) else int(r.payload))
            for r in m.itertuples()}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 24), st.integers(0, 24)),
                min_size=0, max_size=40))
def test_connected_components_matches_union_find_on_random_graphs(
        spark, edges):
    """Distributed CC (min-label + pointer jumping) vs a pure-Python
    union-find on arbitrary graphs — self-loops, duplicates, multiple
    components, long chains. Also pins the local path == distributed
    path on the same input."""
    from cow_spark.operators.canon import connected_components

    df = spark.createDataFrame(
        [(f"n{a:02d}", f"n{b:02d}") for a, b in edges] or
        [("n00", "n00")],  # degenerate: self-loop only
        "src string, dst string")
    dist = {r["node"]: r["component"]
            for r in connected_components(df).collect()}
    local = {r["node"]: r["component"]
             for r in connected_components(
                 df, local_threshold=10_000).collect()}

    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges or [(0, 0)]:
        u, v = f"n{a:02d}", f"n{b:02d}"
        if u == v:
            continue  # operator drops self-loops (and lone nodes)
        for n in (u, v):
            parent.setdefault(n, n)
            nodes.add(n)
        ra, rb = find(u), find(v)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    # component = min member, matching the operator's contract
    comp_min: dict = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[find(n)] for n in nodes}
    assert dist == want
    assert local == want


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                min_size=1, max_size=50))
def test_link_prediction_matches_twin_on_random_graphs(spark, pairs):
    from cow_spark.operators import dedup
    from cow_spark.operators.graphrank import (
        link_prediction, link_prediction_py)

    edges = [(f"n{a}", f"n{b}") for a, b in pairs]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = link_prediction(df)
    got = {(r["x"], r["y"]): (r["cn"], r["aa_fp"]) for r in out.collect()}
    dedup.release(out)
    assert got == link_prediction_py(edges)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                min_size=1, max_size=50),
       st.integers(1, 3), st.sampled_from([None, 1, 2]))
def test_khop_sample_matches_twin_on_random_graphs(spark, pairs, k, fanout):
    from cow_spark.operators.graphrank import khop_sample, khop_sample_py

    edges = [(f"n{a}", f"n{b}") for a, b in pairs]
    seeds = ["n0", "n7"]
    df = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node string")
    got = sorted((r["hop"], r["u"], r["v"]) for r in
                 khop_sample(df, sdf, k=k, fanout=fanout).collect())
    assert got == sorted(khop_sample_py(edges, seeds, k=k, fanout=fanout))


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)),
                min_size=1, max_size=40))
def test_clustering_coefficient_matches_twin_on_random_graphs(spark, pairs):
    from cow_spark.operators import dedup
    from cow_spark.operators.graphrank import (
        clustering_coefficient, clustering_coefficient_py)

    edges = [(f"n{a}", f"n{b}") for a, b in pairs]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = clustering_coefficient(df)
    got = {r["node"]: (r["degree"], r["n_tri"], r["lcc_fp"])
           for r in out.collect()}
    dedup.release(out)
    assert got == clustering_coefficient_py(edges)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(st.sampled_from(["sco", "spo", "dom", "rng"]),
                       st.integers(0, 5), st.integers(0, 5)),
             min_size=0, max_size=10),
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 4),
                       st.booleans()),
             min_size=1, max_size=12),
)
def test_rdfs_closure_matches_fixed_point_on_random_kgs(
        spark, schema_edges, inst):
    """Random ρdf schemas (incl. cycles, diamonds, properties that are
    also classes) + random instance triples: the one-pass Spark closure
    must equal the naive fixed-point twin."""
    from cow_spark.model import QUAD_SCHEMA
    from cow_spark.plans.entail import (
        RDF_TYPE, RDFS_DOMAIN, RDFS_RANGE, RDFS_SUBCLASS, RDFS_SUBPROP,
        rdfs_closure, rdfs_closure_py)

    preds = {"sco": RDFS_SUBCLASS, "spo": RDFS_SUBPROP,
             "dom": RDFS_DOMAIN, "rng": RDFS_RANGE}
    quads = [("g", ("c" if k == "sco" else "p") + str(a), preds[k],
              "iri", ("p" if k == "spo" else "c") + str(b), None, None)
             for k, a, b in schema_edges]
    quads += [
        ("g", f"x{i}", RDF_TYPE, "iri", f"c{i % 6}", None, None)
        if p == 4 else
        ("g", f"x{i}", f"p{p}", "iri" if is_iri else "lit",
         f"y{i}" if is_iri else f"v{i}", None, None)
        for i, p, is_iri in inst]
    df = spark.createDataFrame(quads, QUAD_SCHEMA)
    got = {tuple(r) for r in rdfs_closure(df).collect()}
    assert got == rdfs_closure_py(quads)
