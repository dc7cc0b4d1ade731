"""Connected-components dedup grouping (alternating large-star /
small-star, Kiveris et al. SoCC'14) — the group-resolution step over
LSH candidate pairs.

Checks: transitive closure over chains longer than the round count of
naive label propagation would allow cheaply, multiple components,
singleton-free output, determinism of the canonical (min-id) label,
and the sf0.01 suite entry's shape.
"""

from __future__ import annotations

from lucene_solr_spark.relational.pipeline import _alternating_cc


def _cc_dict(spark, pairs):
    df = spark.createDataFrame(pairs, "u long, v long")
    out = _alternating_cc(df).collect()
    return {r["doc_id"]: r["group_id"] for r in out}


def test_chain_collapses_to_one_group(spark):
    # a 20-node path: diameter 19, but large-star/small-star needs
    # only O(log n) rounds — and the hard cap is 64
    pairs = [(i, i + 1) for i in range(19)]
    got = _cc_dict(spark, pairs)
    assert set(got) == set(range(20))
    assert set(got.values()) == {0}


def test_multiple_components_and_min_label(spark):
    pairs = [(5, 9), (9, 7),          # component {5, 7, 9} → 5
             (100, 42),               # component {42, 100} → 42
             (3, 2)]                  # component {2, 3} → 2
    got = _cc_dict(spark, pairs)
    assert got == {5: 5, 9: 5, 7: 5, 100: 42, 42: 42, 2: 2, 3: 2}


def test_star_input_is_fixpoint(spark):
    # already-canonical star converges immediately and unchanged
    pairs = [(0, 1), (0, 2), (0, 3)]
    got = _cc_dict(spark, pairs)
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "u long, v long")
    assert _alternating_cc(df).count() == 0


def test_bridged_bands_merge(spark):
    # two dense cliques bridged by one edge: a~b pairs from one LSH
    # band, b~c from another — group resolution must merge them even
    # though a and c never shared a band (the motivating case)
    left = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    right = [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    bridge = [(3, 10)]
    got = _cc_dict(spark, left + right + bridge)
    assert set(got.values()) == {0}
    assert len(got) == 8


def test_suite_entry_shape(spark):
    from lucene_solr_spark.relational.pipeline import dedup_groups_cc

    out = dedup_groups_cc(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    # every member's group_id is a member of its own group, and the
    # minimum of it
    by_group: dict = {}
    for r in rows:
        by_group.setdefault(r["group_id"], []).append(r["doc_id"])
    for gid, members in by_group.items():
        assert gid == min(members)
        for r in rows:
            if r["group_id"] == gid:
                assert r["group_size"] == len(members)


def test_distributed_path_matches_driver_unionfind(spark, monkeypatch):
    """The alternating-star distributed rounds (used above the
    _CC_DRIVER_MAX threshold) must produce exactly the labels the
    driver union-find fast path gives on the same graph — random
    graphs across shapes (chains force multi-round convergence)."""
    import random

    from lucene_solr_spark.relational import pipeline as P

    rng = random.Random(99)
    cases = []
    # long chain (diameter stress), random sparse, two cliques + bridge
    cases.append([(i, i + 1) for i in range(0, 60, 1)])
    cases.append([(rng.randrange(0, 80), rng.randrange(0, 80))
                  for _ in range(70)])
    cases.append([(i, j) for i in range(5) for j in range(i + 1, 5)]
                 + [(i, j) for i in range(20, 25) for j in range(i + 1, 25)]
                 + [(4, 20)])
    for pairs in cases:
        pairs = [(u, v) for u, v in pairs if u != v]
        df = spark.createDataFrame(pairs, "u long, v long")
        monkeypatch.setattr(P, "_CC_DRIVER_MAX", -1)  # force distributed
        dist = {r["doc_id"]: r["group_id"]
                for r in P._alternating_cc(df).collect()}
        monkeypatch.setattr(P, "_CC_DRIVER_MAX", 10**9)  # force driver
        drv = {r["doc_id"]: r["group_id"]
               for r in P._alternating_cc(df).collect()}
        assert dist == drv, pairs
