"""Property tests for the ranking / time-series / graph plans —
invariants the oracle hash can't express (the oracle proves value
equality; these prove the *semantics* hold on any data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omniengine_spark.plans import QUERIES
from omniengine_spark.sources import load_table

from .conftest import SF_CORRECT, SF_SMOKE


def test_debounce_kept_events_respect_min_gap(spark):
    kept = QUERIES["w11_debounce_events"](spark, SF_CORRECT)
    from pyspark.sql import Window

    from omniengine_spark.functions.scalars import epoch_us

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = kept.select(
        "user_id",
        (epoch_us("ts") - F.lag(epoch_us("ts")).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    # every two consecutive *kept* events are > 5 min apart: a keeper
    # within the gap would have been suppressed into the prior burst
    assert gaps.filter(F.col("gap_us") <= 300_000_000).count() == 0


def test_debounce_accounts_for_every_click(spark):
    kept = QUERIES["w11_debounce_events"](spark, SF_CORRECT)
    total_clicks = (
        load_table(spark, SF_CORRECT, "events")
        .filter(F.col("event_type") == "click")
        .count()
    )
    row = kept.agg(
        F.count(F.lit(1)).alias("kept"),
        F.sum("n_suppressed").alias("supp"),
    ).first()
    assert row["kept"] + row["supp"] == total_clicks


def test_gap_fill_series_is_dense_and_locf(spark):
    out = QUERIES["ts_gap_fill_locf"](spark, SF_CORRECT)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("day")
    stepped = out.select(
        "user_id",
        "day",
        "cents_filled",
        "is_gap",
        F.datediff(
            F.to_date("day"), F.to_date(F.lag("day").over(w))
        ).alias("step"),
        F.lag("cents_filled").over(w).alias("prev_filled"),
    )
    # dense calendar: every consecutive row is exactly one day apart
    assert (
        stepped.filter(
            F.col("step").isNotNull() & (F.col("step") != 1)
        ).count()
        == 0
    )
    # LOCF: a gap day carries its predecessor's value unchanged
    assert (
        stepped.filter(
            F.col("is_gap")
            & (F.col("cents_filled") != F.col("prev_filled"))
        ).count()
        == 0
    )
    # no leading nulls: each user's span starts at an observed day
    assert out.filter(F.col("cents_filled").isNull()).count() == 0


def test_tfidf_ranks_are_dense_per_doc(spark):
    out = QUERIES["text_tfidf_topk"](spark, SF_SMOKE)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rank").alias("lo"),
        F.max("rank").alias("hi"),
    )
    bad = per_doc.filter(
        (F.col("lo") != 1) | (F.col("hi") != F.col("n")) | (F.col("n") > 3)
    )
    assert bad.count() == 0


def test_pagerank_mass_bounds(spark):
    out = QUERIES["graph_pagerank"](spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) > 0
    scale, teleport = 100_000_000, 15_000_000
    for r in rows:
        # teleport floor always holds; integer damping can never mint
        # more than the full graph's mass into one node
        assert r["rank"] >= teleport
    # descending, deterministic ordering
    ranks = [(r["rank"], r["node"]) for r in rows]
    assert ranks == sorted(ranks, key=lambda t: (-t[0], t[1]))
    # the top node concentrates more than one node's initial share —
    # the hub actually accumulates mass (sanity that iteration ran)
    assert rows[0]["rank"] > scale


def test_k_hop_reachability_matches_bruteforce_bfs(spark):
    """Level-synchronous BFS operator vs a driver-side BFS on a
    small cyclic multigraph — min hop distances must agree exactly
    and nodes beyond max_hops must be absent."""
    import random

    from omniengine_spark.operators.graph import k_hop_reachability

    rng = random.Random(11)
    n, m, k = 40, 120, 3
    edge_list = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(m)
    ]
    adj: dict[int, set[int]] = {}
    for s, d in edge_list:
        adj.setdefault(s, set()).add(d)
    # brute force BFS from node 0
    dist = {0: 0}
    frontier = {0}
    for h in range(1, k + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.add(v)
        frontier = nxt

    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {
        r["node"]: r["hops"]
        for r in k_hop_reachability(edges, seeds, k).collect()
    }
    assert got == dist


def test_taint_reach_hop_zero_is_seed_and_hops_alternate_parity(spark):
    """On the bipartite customer/supplier graph, odd hops are
    suppliers (offset ids) and even hops are customers — the BFS
    must respect the bipartite structure."""
    out = QUERIES["graph_taint_reach"](spark, SF_SMOKE).collect()
    by_hop: dict[int, list[int]] = {}
    for r in out:
        by_hop.setdefault(r["hops"], []).append(r["node"])
    assert by_hop[0] == [7]
    for hop, nodes in by_hop.items():
        for node in nodes:
            is_supplier = node >= 1_000_000
            assert is_supplier == (hop % 2 == 1), (hop, node)
