"""Connected components: chains, cliques, and cross-links converge to
min-label components."""

from __future__ import annotations

from pyspark.sql import Row

from currency_market_pulse_spark.operators.components import connected_components


def _pairs(spark, edges):
    return spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])


def test_chain_and_clique(spark):
    # chain 1-2-3-4 (diameter 3, needs multiple rounds) + clique 10-11-12
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)]
    out = {r.node: r.comp for r in connected_components(_pairs(spark, edges)).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_merge_via_bridge(spark):
    # two clusters connected by one bridge edge collapse to one comp
    edges = [(1, 2), (3, 4), (2, 3)]
    out = {r.node: r.comp for r in connected_components(_pairs(spark, edges)).collect()}
    assert set(out.values()) == {1}
