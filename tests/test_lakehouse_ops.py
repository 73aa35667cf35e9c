"""Lakehouse mutation + governance operators: CDC merge semantics,
SCD2 collapse, PII redaction, blocked fuzzy matching."""

from __future__ import annotations

from pyspark.sql import functions as F

from investcloud_data_pipeline_spark.operators.er import (
    block_size_profile,
    fuzzy_self_join,
)
from investcloud_data_pipeline_spark.operators.merge import (
    apply_cdc,
    scd2_history,
)
from investcloud_data_pipeline_spark.operators.pii import redact_pii


class TestApplyCdc:
    def _run(self, spark, base_rows, change_rows):
        base = spark.createDataFrame(base_rows, "k long, v string")
        changes = spark.createDataFrame(
            change_rows, "k long, v string, op string, seq long"
        )
        out = apply_cdc(base, changes, key_cols=["k"], seq_col="seq")
        return {r.k: r.v for r in out.collect()}

    def test_update_insert_delete_untouched(self, spark):
        got = self._run(
            spark,
            [(1, "a"), (2, "b"), (3, "c")],
            [
                (1, "a2", "U", 10),   # update
                (3, None, "D", 11),   # delete
                (9, "new", "U", 12),  # insert
            ],
        )
        assert got == {1: "a2", 2: "b", 9: "new"}

    def test_last_change_per_key_wins(self, spark):
        got = self._run(
            spark,
            [(1, "a")],
            [(1, "mid", "U", 5), (1, "last", "U", 9), (1, "first", "U", 1)],
        )
        assert got == {1: "last"}

    def test_delete_then_reinsert_ordered_by_seq(self, spark):
        got = self._run(
            spark,
            [(1, "a")],
            [(1, None, "D", 5), (1, "back", "U", 7)],
        )
        assert got == {1: "back"}

    def test_rerun_is_idempotent(self, spark):
        base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        changes = spark.createDataFrame(
            [(1, "a2", "U", 10), (2, None, "D", 11)],
            "k long, v string, op string, seq long",
        )
        once = apply_cdc(base, changes, ["k"], "seq")
        twice = apply_cdc(once, changes, ["k"], "seq")
        assert sorted(once.collect()) == sorted(twice.collect())


class TestScd2:
    def test_collapses_runs_and_tracks_validity(self, spark):
        rows = [
            (1, "GOLD", "2024-01-01"),
            (1, "GOLD", "2024-02-01"),   # unchanged → collapsed
            (1, "SILVER", "2024-03-01"),
            (1, "GOLD", "2024-04-01"),   # back again → new version
            (2, "BRONZE", "2024-01-15"),
        ]
        df = spark.createDataFrame(rows, "k long, tier string, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        hist = scd2_history(df, ["k"], ["tier"], "ts")
        got = [
            (r.k, r.tier, str(r.valid_from)[:10],
             str(r.valid_to)[:10] if r.valid_to else None, r.is_current)
            for r in hist.orderBy("k", "valid_from").collect()
        ]
        assert got == [
            (1, "GOLD", "2024-01-01", "2024-03-01", False),
            (1, "SILVER", "2024-03-01", "2024-04-01", False),
            (1, "GOLD", "2024-04-01", None, True),
            (2, "BRONZE", "2024-01-15", None, True),
        ]

    def test_exactly_one_current_row_per_key(self, spark):
        rows = [(k, f"v{k % 3}_{i % 2}", f"2024-0{1 + i}-01") for k in range(5) for i in range(4)]
        df = spark.createDataFrame(rows, "k long, tier string, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        hist = scd2_history(df, ["k"], ["tier"], "ts")
        per_key = hist.filter("is_current").groupBy("k").count().collect()
        assert all(r["count"] == 1 for r in per_key) and len(per_key) == 5


class TestRedactPii:
    def test_masks_and_counts_every_class(self, spark):
        df = spark.createDataFrame(
            [(1, "mail a.b@x.io or c@y.org, tel 555-123-4567, "
                 "host 192.168.0.1, ssn 987-65-4321 end")],
            "id long, text string",
        )
        row = redact_pii(df).collect()[0]
        assert (row.n_email, row.n_phone, row.n_ipv4, row.n_ssn) == (2, 1, 1, 1)
        assert row.n_pii == 5
        assert row.redacted == (
            "mail <EMAIL> or <EMAIL>, tel <PHONE>, host <IP>, ssn <SSN> end"
        )

    def test_clean_text_untouched_and_original_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "no pii here, just 42 words and v1.2 versions")],
            "id long, text string",
        )
        out = redact_pii(df)
        row = out.collect()[0]
        assert row.n_pii == 0
        assert row.redacted == "no pii here, just 42 words and v1.2 versions"
        assert "text" not in out.columns
        kept = redact_pii(df, keep_original=True)
        assert "text" in kept.columns


class TestFuzzyJoin:
    def test_blocking_limits_pairs_and_distance_filters(self, spark):
        rows = [
            (1, "red ring"), (2, "blue ring"), (3, "red gear"),
            (4, "rod ring"),  # lev(red→rod)=1
        ]
        df = spark.createDataFrame(rows, "pk long, name string")
        pairs = fuzzy_self_join(
            df, "pk", "name",
            block_expr=F.element_at(F.split(F.col("name"), " "), 2),
            max_distance=3,
        )
        got = {(r.id1, r.id2): r.distance for r in pairs.collect()}
        # (1,4) lev=1 in-block; (1,2) lev=4 and (2,4) lev=4 filtered by
        # distance; (x,3) cross-block never scored.
        assert got == {(1, 4): 1}

    def test_block_size_profile_counts_pairs(self, spark):
        df = spark.createDataFrame(
            [(i, f"n{i % 2}") for i in range(7)], "pk long, b string"
        )
        prof = {
            r.block: (r.n_rows, r.n_pairs)
            for r in block_size_profile(df, F.col("b")).collect()
        }
        assert prof == {"n0": (4, 6), "n1": (3, 3)}


class TestExpectations:
    def test_suite_counts_planted_violations(self, spark):
        from investcloud_data_pipeline_spark.operators import expectations as E

        df = spark.createDataFrame(
            [
                (1, "A", 10.0, "x-1"),
                (1, "A", -5.0, "x-2"),     # dup id, negative value
                (2, None, 3.0, "bad"),     # null status, regex miss
                (3, "Z", 7.0, "x-3"),      # unaccepted status
            ],
            "id long, status string, v double, code string",
        )
        ref = spark.createDataFrame([(1,), (2,)], "k long")
        report = {
            r.check: (r.n_violations, r.passed)
            for r in E.validate(
                df,
                [
                    E.not_null("status"),
                    E.accepted_values("status", ["A", "B"]),
                    E.in_range("v", 0.0, None),
                    E.matches("code", r"^x-\d+$"),
                    E.unique("id"),
                    E.references("id", ref, "k"),
                ],
            ).collect()
        }
        assert report == {
            "not_null:status": (1, False),
            "accepted_values:status": (2, False),  # null + 'Z'
            "in_range:v": (1, False),
            "matches:code": (1, False),
            "unique:id": (1, False),
            "references:id->k": (1, False),  # id=3 orphaned
        }

    def test_clean_table_passes_everything(self, spark):
        from investcloud_data_pipeline_spark.operators import expectations as E

        df = spark.createDataFrame(
            [(1, "A"), (2, "B")], "id long, status string"
        )
        report = E.validate(
            df,
            [E.not_null("status"), E.accepted_values("status", ["A", "B"]),
             E.unique("id")],
        )
        assert all(r.passed for r in report.collect())


class TestKAnonymity:
    def _df(self, spark):
        rows = (
            [("US", "A")] * 5      # exactly k → not a violation
            + [("US", "B")] * 2    # < k → violation
            + [("DE", "A")] * 7    # > k → fine
        )
        return spark.createDataFrame(rows, "country string, seg string")

    def test_classes_and_violations(self, spark):
        from investcloud_data_pipeline_spark.operators.pii import k_anonymity

        out = {
            (r["country"], r["seg"]): (r["class_size"], r["is_violation"])
            for r in k_anonymity(self._df(spark), ["country", "seg"], k=5).collect()
        }
        assert out == {
            ("US", "A"): (5, False),
            ("US", "B"): (2, True),
            ("DE", "A"): (7, False),
        }

    def test_suppression_summary(self, spark):
        from investcloud_data_pipeline_spark.operators.pii import (
            suppression_summary,
        )

        row = suppression_summary(
            self._df(spark), ["country", "seg"], k=5
        ).collect()[0]
        assert row["n_classes"] == 3
        assert row["n_violating"] == 1
        assert row["suppression_rate"] == round(2 / 14, 6)


class TestScd2PointInTime:
    """The PIT union+window plan must implement half-open [from, to)
    interval semantics exactly — including never picking a zero-length
    version (two priority changes on the same day) and NULL before the
    first version."""

    def test_pit_semantics_crafted(self, spark, tmp_path):
        import datetime as dt

        d = lambda y, m, day: dt.datetime(y, m, day)  # noqa: E731
        orders = spark.createDataFrame(
            [
                # cust 1: LOW from Jan1; same-day supersession on Feb1
                # (HIGH then URGENT sort after HIGH -> URGENT wins Feb1+)
                (100, 1, "O", 10.0, d(2000, 1, 1), "3-LOW"),
                (101, 1, "O", 10.0, d(2000, 2, 1), "1-HIGH"),
                (102, 1, "O", 10.0, d(2000, 2, 1), "2-URGENT"),
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        )
        lineitem = spark.createDataFrame(
            [
                # ship before any version -> NULL
                (100, 1, 1.0, d(1999, 12, 30)),
                # inside LOW's interval
                (100, 2, 1.0, d(2000, 1, 15)),
                # ON the supersession day: HIGH's interval is empty
                # [Feb1, Feb1) -> URGENT applies
                (101, 1, 1.0, d(2000, 2, 1)),
                # after -> URGENT (open interval)
                (102, 1, 1.0, d(2000, 3, 1)),
            ],
            "l_orderkey long, l_linenumber int, l_quantity double, "
            "l_shipdate timestamp",
        )
        orders.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        lineitem.write.mode("overwrite").parquet(
            str(tmp_path / "lineitem.parquet")
        )

        from investcloud_data_pipeline_spark.plans.lakehouse import (
            scd2_point_in_time_join,
        )

        out = {
            (r.l_orderkey, r.l_linenumber): r.priority_at_ship
            for r in scd2_point_in_time_join(spark, str(tmp_path)).collect()
        }
        assert out == {
            (100, 1): None,
            (100, 2): "3-LOW",
            (101, 1): "2-URGENT",
            (102, 1): "2-URGENT",
        }


class TestSnapshotDiff:
    def test_all_change_classes_and_null_keys(self, spark):
        from investcloud_data_pipeline_spark.operators.merge import (
            snapshot_diff,
        )

        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (None, "n", 1.0)],
            "k long, name string, bal double",
        )
        new = spark.createDataFrame(
            [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0), (None, "n", 2.0)],
            "k long, name string, bal double",
        )
        out = {
            r.k: (r.change_type, sorted(r.changed_cols))
            for r in snapshot_diff(old, new, ["k"]).collect()
        }
        # k=1 unchanged -> absent; NULL keys diff like values (null-safe)
        assert out == {
            2: ("update", ["name"]),
            3: ("delete", []),
            4: ("insert", []),
            None: ("update", ["bal"]),
        }
        withu = snapshot_diff(old, new, ["k"], include_unchanged=True)
        assert {r.k: r.change_type for r in withu.collect()}[1] == "unchanged"

    def test_diff_recovers_cdc_batch(self, spark):
        """diff(base, apply_cdc(base, changes)) classifies exactly the
        keys the CDC batch touched — the change feed recovered from
        snapshots alone."""
        from investcloud_data_pipeline_spark.operators.merge import (
            apply_cdc,
            snapshot_diff,
        )

        base = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k long, name string, bal double",
        )
        changes = spark.createDataFrame(
            [
                ("U", 1, 1, "a", 99.0),   # update k=1
                ("D", 2, 2, None, None),  # delete k=2
                ("U", 3, 9, "z", 50.0),   # insert k=9
            ],
            "op string, seq long, k long, name string, bal double",
        )
        new = apply_cdc(base, changes, key_cols=["k"], seq_col="seq")
        out = {
            r.k: r.change_type
            for r in snapshot_diff(base, new, ["k"]).collect()
        }
        assert out == {1: "update", 2: "delete", 9: "insert"}


def test_golden_record_survivorship_rules(spark, tmp_path):
    from investcloud_data_pipeline_spark.plans.lakehouse import (
        er_golden_record,
    )

    # One fuzzy entity ("acme widget red" ×2 / "acme widget rex" ×1 —
    # same 'widget' block, lev distance 1) plus an unmatched singleton.
    rows = [
        (1, "acme widget red", "B1", "t", 1, 10.0),
        (2, "acme widget red", "B1", "t", 1, 15.0),
        (3, "acme widget rex", "B2", "t", 1, 20.0),
        (4, "zzz gadget blue", "B9", "t", 1, 7.5),
    ]
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    got = {
        r.entity_id: (
            r.survivor_name, r.n_variants, r.total_recs,
            r.modal_brand, r.price_min, r.price_max,
        )
        for r in er_golden_record(spark, str(tmp_path)).collect()
    }
    assert got == {
        # min-name component label; survivor = most-record variant,
        # modal brand = most-record brand, band spans ALL variants
        "acme widget red": ("acme widget red", 2, 3, "B1", 10.0, 20.0),
        "zzz gadget blue": ("zzz gadget blue", 1, 1, "B9", 7.5, 7.5),
    }
