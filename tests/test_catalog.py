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


def test_parameterized_sql(spark):
    """Named-parameter SQL (injection-safe substitution at parse time)."""
    df = spark.sql(
        "SELECT id FROM range(0, 100) WHERE id % :m = 0 AND id >= :lo",
        args={"m": 7, "lo": 50},
    )
    assert [r.id for r in df.orderBy("id").collect()] == [56, 63, 70, 77, 84, 91, 98]


def test_dynamic_partition_overwrite(spark, tmp_path):
    """INSERT OVERWRITE with dynamic partitionOverwriteMode replaces only
    the partitions present in the incoming batch — the idempotent
    backfill pattern for date-partitioned layers (static mode would wipe
    every other partition)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "parts")
    base = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).alias("g")
    )
    base.write.partitionBy("g").parquet(path)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # backfill partition g=1 only, with rewritten values
        spark.range(1000, 1010).select(
            F.col("id"), F.lit(1).alias("g")
        ).write.mode("overwrite").partitionBy("g").parquet(path)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    out = spark.read.parquet(path)
    assert out.filter("g = 1").count() == 10          # replaced
    assert out.filter("g = 0").count() == 25          # untouched
    assert out.filter("g = 2").count() == 25
    assert out.filter("g = 3").count() == 25
    assert out.filter("g = 1 AND id >= 1000").count() == 10


def test_sql_scalar_and_table_function_surface(spark):
    """Spark 4 SQL UDFs (CREATE FUNCTION ... RETURN expr): declarative,
    catalog-registered, fully optimizable — Catalyst inlines the body,
    so unlike Python UDFs they stay in codegen."""
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS disc_price")
    spark.sql(
        "CREATE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    got = spark.sql(
        "SELECT round(disc_price(100.0, 0.25), 2) AS v"
    ).collect()[0].v
    assert got == 75.0

    # lateral column alias: later select items reference earlier ones
    row = spark.sql(
        "SELECT 21 AS half, half * 2 AS full_val"
    ).collect()[0]
    assert (row.half, row.full_val) == (21, 42)


class TestSqlFunctions:
    """Declarative SQL UDFs (CREATE FUNCTION ... RETURN): scalar bodies
    inline into the Catalyst plan (no Python eval node), and SQL table
    functions expand like built-in TVFs."""

    def test_scalar_sql_udf_inlines_into_codegen(self, spark):
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION add_vat(p DOUBLE) "
            "RETURNS DOUBLE RETURN p * 1.2"
        )
        df = spark.range(5).selectExpr("add_vat(CAST(id AS DOUBLE)) AS v")
        got = [r.v for r in df.collect()]
        assert all(abs(g - e) < 1e-9 for g, e in zip(got, [0.0, 1.2, 2.4, 3.6, 4.8]))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_sql_table_function_lateral(self, spark):
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION int_grid(n INT) "
            "RETURNS TABLE(i INT) RETURN SELECT explode(sequence(1, n))"
        )
        out = spark.sql(
            "SELECT t.id, g.i FROM (SELECT id FROM range(2, 4)) t, "
            "LATERAL int_grid(CAST(t.id AS INT)) g"
        ).collect()
        got = {(r.id, r.i) for r in out}
        assert got == {(2, 1), (2, 2), (3, 1), (3, 2), (3, 3)}


def test_analyze_table_feeds_cbo_stats(spark):
    """ANALYZE TABLE COMPUTE STATISTICS (table + columns) populates the
    catalog stats CBO reads: rowCount on the relation and per-column
    distinct counts — the at-scale prerequisite for join reordering and
    broadcast decisions on catalog tables (file listings only give
    sizeInBytes)."""
    name = "cbo_stats_probe"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        spark.range(0, 1000).selectExpr(
            "id AS k", "CAST(id % 7 AS INT) AS grp"
        ).write.saveAsTable(name)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS k, grp")

        det = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        }
        assert "1000 rows" in det.get("Statistics", "")

        col = {
            r.info_name: r.info_value
            for r in spark.sql(
                f"DESCRIBE TABLE EXTENDED {name} grp"
            ).collect()
        }
        assert col.get("distinct_count") == "7"
        assert col.get("num_nulls") == "0"

        # with CBO on, the optimized plan carries the analyzed rowCount
        prev = spark.conf.get("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            stats = (
                spark.table(name)
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .toString()
            )
            assert "rowCount=1.00E+3" in stats or "rowCount=1000" in stats
        finally:
            spark.conf.set("spark.sql.cbo.enabled", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
