"""Catalog surface: managed-table lifecycle (saveAsTable → spark.table →
insertInto append → catalog listing → drop) against the session
warehouse."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_managed_table_lifecycle(spark):
    name = "t_catalog_lifecycle"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        base = spark.range(0, 100).select(
            F.col("id"), (F.col("id") % 5).alias("g")
        )
        base.write.saveAsTable(name)
        assert spark.table(name).count() == 100
        assert any(t.name == name for t in spark.catalog.listTables())

        spark.range(100, 150).select(
            F.col("id"), (F.col("id") % 5).alias("g")
        ).write.insertInto(name)
        assert spark.table(name).count() == 150

        # SQL over the catalog table sees the same rows
        got = spark.sql(f"SELECT g, count(*) AS n FROM {name} GROUP BY g")
        assert sum(r.n for r in got.collect()) == 150
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    assert all(t.name != name for t in spark.catalog.listTables())
