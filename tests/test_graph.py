"""Connected components: known topologies resolve to min-id labels,
convergence is reached within diameter rounds, output is deterministic."""

from __future__ import annotations

from investcloud_data_pipeline_spark.operators.graph import (
    canonical_per_component,
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df)
    return {r.node: r.component for r in out.collect()}


def test_chain_triangle_and_pair(spark):
    # chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), pair 20-21
    got = _cc(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
    )
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_long_chain_needs_propagation_rounds(spark):
    # a 12-node path: min label must travel the full diameter
    got = _cc(spark, [(i, i + 1) for i in range(12)])
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_direction_and_duplicate_edges_are_irrelevant(spark):
    a = _cc(spark, [(5, 9), (9, 5), (5, 9), (7, 9)])
    assert a == {5: 5, 9: 5, 7: 5}


def test_canonical_per_component(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (20, 21)], "src long, dst long"
    )
    labeled = connected_components(df)
    canon = {
        r.component: (r.canonical, r.cluster_size)
        for r in canonical_per_component(labeled).collect()
    }
    assert canon == {1: (1, 3), 20: (20, 2)}
