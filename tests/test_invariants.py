"""Property-based invariants (SURVEY §5 strategy item 3).

Hypothesis generates adversarial little event streams; the engine's
algebraic invariants must hold on every one of them:

* double-entry conservation — every d1-style expansion sums to zero
* pro-rata allocation bounds — nobody exceeds their ceil share, the
  pot is never over-spent, and it is exhausted whenever shares cover it
* replay ≡ closed form — the sequential floor fold and the window
  formulation agree on any stream
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import math

# ---- pure-python reference models (no Spark in the hot loop) -------


def closed_form_floor(deltas: list[int]) -> list[int]:
    out, run_sum, run_min = [], 0, 0
    for d in deltas:
        run_sum += d
        run_min = min(run_min, run_sum)
        out.append(run_sum - min(run_min, 0))
    return out


def sequential_floor(deltas: list[int]) -> list[int]:
    out, bal = [], 0
    for d in deltas:
        bal = max(0, bal + d)
        out.append(bal)
    return out


def pro_rata(pot_c: int, weights: list[int]) -> list[int]:
    """The d2 allocation in pure python: ceil shares in weight-desc
    order, cutoff when the pot runs out."""
    total = sum(weights)
    order = sorted(range(len(weights)), key=lambda i: (-weights[i], i))
    alloc = [0] * len(weights)
    spent = 0
    for i in order:
        share = math.ceil(pot_c * weights[i] / total)
        give = max(0, min(share, pot_c - spent))
        alloc[i] = give
        spent += give
    return alloc


# ---- properties ----------------------------------------------------


@given(st.lists(st.integers(-10_000, 10_000), max_size=200))
def test_replay_equals_closed_form(deltas):
    assert sequential_floor(deltas) == closed_form_floor(deltas)


@given(
    st.integers(0, 10_000_000),
    st.lists(st.integers(1, 10_000), min_size=1, max_size=50),
)
def test_pro_rata_bounds(pot_c, weights):
    alloc = pro_rata(pot_c, weights)
    total = sum(weights)
    assert sum(alloc) <= pot_c  # never over-spend
    for a, w in zip(alloc, weights):
        assert 0 <= a <= math.ceil(pot_c * w / total)  # never over-share
    # if ceil shares cover the pot, the pot must be fully spent
    if sum(math.ceil(pot_c * w / total) for w in weights) >= pot_c:
        assert sum(alloc) == pot_c


# ---- the same invariants on the real Spark plans -------------------


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 9),  # user
            st.integers(-500, 500),  # delta cents
        ),
        min_size=1,
        max_size=60,
    )
)
def test_spark_replay_matches_python_model(spark, rows):
    from pyspark.sql import functions as F

    from omniengine_spark.operators.replay import floor_balance_replay

    data = [
        (i, user, f"2020-01-01 00:{i:02d}:00"[:19], delta)
        for i, (user, delta) in enumerate(rows[:60])
    ]
    df = spark.createDataFrame(
        data, ["event_id", "user_id", "ts", "delta_cents"]
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["event_id"]: r["balance_cents"]
        for r in floor_balance_replay(df).collect()
    }
    # python model per user, in event order
    per_user: dict[int, list[tuple[int, int]]] = {}
    for eid, (user, delta) in enumerate(rows[:60]):
        per_user.setdefault(user, []).append((eid, delta))
    for user, evs in per_user.items():
        bals = sequential_floor([d for _, d in evs])
        for (eid, _), b in zip(evs, bals):
            assert got[eid] == b, (user, eid)


def test_d1_conservation(spark):
    """Double-entry expansion must sum to zero per order and overall."""
    from pyspark.sql import functions as F

    from omniengine_spark.plans.domain import d1_double_entry_ledger

    out = d1_double_entry_ledger(spark, "/root/testdata/sf0.001")
    total = out.agg(
        F.sum(F.col("balance").cast("decimal(28,4)")).alias("t")
    ).collect()[0]["t"]
    assert total == 0


# ---- bucketed range-join decomposition (operators/rangejoin.py) ----
# Pure-python model of the bucket math; the Spark plumbing is pinned
# by tests/test_rangejoin.py.  Floor-division here matches F.floor
# on negatives (both round toward -inf).


@given(
    st.lists(st.integers(-10_000, 10_000), max_size=30),
    st.lists(
        st.tuples(
            st.integers(-10_000, 10_000), st.integers(0, 5_000)
        ),
        max_size=20,
    ),
    st.integers(1, 1_000),
)
@settings(suppress_health_check=[HealthCheck.too_slow], deadline=None)
def test_bucket_decomposition_never_misses_a_match(points, spans, width):
    intervals = [(lo, lo + span) for lo, span in spans]
    for p in points:
        pb = p // width
        for lo, hi in intervals:
            if lo <= p < hi:
                # the point's bucket lies inside the interval's
                # replicated bucket range — the equi join finds it
                assert lo // width <= pb <= hi // width


@given(
    st.lists(
        st.tuples(
            st.integers(-10_000, 10_000), st.integers(0, 5_000)
        ),
        min_size=2,
        max_size=12,
    ),
    st.integers(1, 1_000),
)
@settings(suppress_health_check=[HealthCheck.too_slow], deadline=None)
def test_canonical_bucket_is_shared_and_unique(spans, width):
    ivs = [(lo, lo + span) for lo, span in spans]
    for a_lo, a_hi in ivs:
        for b_lo, b_hi in ivs:
            if a_lo < b_hi and b_lo < a_hi:  # overlap
                canon = max(a_lo, b_lo) // width
                a_range = range(a_lo // width, a_hi // width + 1)
                b_range = range(b_lo // width, b_hi // width + 1)
                # emitted at least once: canonical bucket is a bucket
                # both sides replicated to
                assert canon in a_range and canon in b_range
                # emitted exactly once: only one bucket id equals the
                # canonical value, trivially — uniqueness of the
                # equality filter over the shared range
                shared = set(a_range) & set(b_range)
                assert canon == min(shared)


def union_find_clusters(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference union-find: node → min id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=80,
    ),
    st.integers(0, 3),  # jump_from: early pointer jumping must not
    # change the fixpoint, only the round count
)
def test_connected_components_matches_union_find(spark, raw_edges, jump):
    from pyspark.sql import functions as F

    from omniengine_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in raw_edges if a != b]
    if not edges:
        return
    nodes = sorted({n for e in edges for n in e})
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    node_df = spark.createDataFrame(
        [(n,) for n in nodes], ["doc_id"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            node_df, pairs, "doc_id", jump_from=jump
        ).collect()
    }
    want = union_find_clusters(edges)
    assert got == want


def test_lm_fluency_mass_conservation(spark):
    """Corpus-trigram model invariants: summing n_trigrams over docs
    equals the model's total frequency mass (every trigram occurrence
    is counted exactly once), every doc joins fully back to the model
    (coverage is total — the model was trained on the same corpus),
    and ratios live in their closed bounds."""
    from pyspark.sql import functions as F

    from omniengine_spark.plans import QUERIES
    from omniengine_spark.sources import load_table

    from .conftest import SF_SMOKE

    out = QUERIES["text_lm_fluency"](spark, SF_SMOKE)
    rows = out.collect()
    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.length("text") >= 3
    )
    expected_mass = docs.select(
        F.sum(F.length("text") - 2).alias("m")
    ).collect()[0]["m"]
    assert sum(r["n_trigrams"] for r in rows) == expected_mass
    assert len(rows) == docs.count()
    for r in rows:
        assert 0.0 <= r["rare_ratio"] <= 1.0
        # every trigram occurs at least once: its own occurrence
        assert r["avg_trigram_freq"] >= 1.0
        assert r["corpus_hits"] >= r["n_trigrams"]
