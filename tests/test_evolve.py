"""Table-evolution operators: SCD2 history, keyed snapshot diff, column
profiling — plus the round-6 event-analytics additions (retention
cohorts, z-score anomalies) and the Gopher rule gate."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

TS = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp_ntz, event_id bigint, attr string"
    )


class TestScd2:
    def test_versions_collapse_and_intervals(self, spark):
        from confluent_data_ingestion_spark.operators.evolve import (
            scd2_from_changelog,
        )

        rows = [
            (1, TS(2024, 1, 1), 1, "a"),
            (1, TS(2024, 1, 2), 2, "a"),   # unchanged -> collapses into v1
            (1, TS(2024, 1, 3), 3, "b"),   # new version
            (1, TS(2024, 1, 4), 4, "a"),   # back to 'a' IS a new version
            (2, TS(2024, 1, 1), 5, "x"),
        ]
        out = scd2_from_changelog(
            _ev(spark, rows), ["user_id"], "ts", ["attr"],
            tie_breakers=["event_id"],
        ).orderBy("user_id", "effective_from").collect()
        assert [(r.user_id, r.attr) for r in out] == [
            (1, "a"), (1, "b"), (1, "a"), (2, "x")]
        # half-open chain: each version's end is the next one's start
        assert out[0].effective_to == out[1].effective_from
        assert out[1].effective_to == out[2].effective_from
        assert out[2].effective_to is None and out[2].is_current
        assert out[3].effective_to is None and out[3].is_current
        assert not out[0].is_current

    def test_null_to_empty_transition_versions(self, spark):
        from confluent_data_ingestion_spark.operators.evolve import (
            scd2_from_changelog,
        )

        rows = [
            (1, TS(2024, 1, 1), 1, None),
            (1, TS(2024, 1, 2), 2, ""),    # NULL -> '' must version
            (1, TS(2024, 1, 3), 3, ""),    # unchanged
        ]
        out = scd2_from_changelog(
            _ev(spark, rows), ["user_id"], "ts", ["attr"],
            tie_breakers=["event_id"],
        ).orderBy("effective_from").collect()
        assert len(out) == 2
        assert out[0].attr is None and out[1].attr == ""

    def test_single_shuffle_plan(self, spark):
        """All windows share the key partitioning: exactly one Exchange."""
        from confluent_data_ingestion_spark.operators.evolve import (
            scd2_from_changelog,
        )

        out = scd2_from_changelog(
            _ev(spark, [(1, TS(2024, 1, 1), 1, "a")]),
            ["user_id"], "ts", ["attr"], tie_breakers=["event_id"],
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


class TestTableDiff:
    def _frames(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
            "k bigint, s string, v double",
        )
        new = spark.createDataFrame(
            [(1, "a", 10.0), (2, "B", 20.0), (4, "", 40.0), (5, "e", 50.0)],
            "k bigint, s string, v double",
        )
        return old, new

    def test_statuses(self, spark):
        from confluent_data_ingestion_spark.operators.evolve import table_diff

        old, new = self._frames(spark)
        got = {
            r.k: r.diff_status
            for r in table_diff(old, new, ["k"]).collect()
        }
        # 1 unchanged (excluded), 2 changed, 3 removed, 4 NULL->'' changed,
        # 5 added
        assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}

    def test_include_unchanged_and_sides(self, spark):
        from confluent_data_ingestion_spark.operators.evolve import table_diff

        old, new = self._frames(spark)
        rows = {
            r.k: r
            for r in table_diff(
                old, new, ["k"], include_unchanged=True
            ).collect()
        }
        assert rows[1].diff_status == "unchanged"
        assert rows[2].s_old == "b" and rows[2].s_new == "B"
        assert rows[3].s_new is None and rows[3].v_new is None
        assert rows[5].s_old is None and rows[5].v_old is None

    def test_compare_cols_subset(self, spark):
        from confluent_data_ingestion_spark.operators.evolve import table_diff

        old, new = self._frames(spark)
        got = {
            r.k: r.diff_status
            for r in table_diff(old, new, ["k"], ["v"]).collect()
        }
        # v is identical on every shared key -> only membership changes
        assert got == {3: "removed", 5: "added"}


class TestProfile:
    def test_exact_profile(self, spark):
        from confluent_data_ingestion_spark.operators.evolve import (
            profile_columns,
        )

        df = spark.createDataFrame(
            [(1, "x"), (2, None), (2, "y")], "a bigint, b string"
        )
        rows = {r.column: r for r in profile_columns(df).collect()}
        assert rows["a"].n_rows == 3 and rows["a"].n_nulls == 0
        assert rows["a"].n_distinct == 2
        assert rows["a"].min_value == "1" and rows["a"].max_value == "2"
        assert rows["b"].n_nulls == 1 and rows["b"].n_distinct == 2

    def test_approx_profile_single_job(self, spark):
        from confluent_data_ingestion_spark.operators.evolve import (
            profile_columns,
        )

        df = spark.range(100).withColumn("s", F.col("id").cast("string"))
        rows = {r.column: r for r in profile_columns(df, approx=True).collect()}
        # HLL with default rsd is exact-ish at n=100
        assert abs(rows["id"].n_distinct - 100) <= 5
        # the approx plan must not contain the Expand rewrite
        plan = (
            profile_columns(df, approx=True)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Expand" not in plan


class TestRetention:
    def test_toy_triangle(self, spark):
        from confluent_data_ingestion_spark.operators.temporal import (
            retention_cohorts,
        )

        # week of 2024-01-01 (Mon) and 2024-01-08
        rows = [
            (1, TS(2024, 1, 2)), (1, TS(2024, 1, 9)),     # cohort w0, back w1
            (2, TS(2024, 1, 3)),                          # cohort w0 only
            (3, TS(2024, 1, 10)),                         # cohort w1
        ]
        ev = spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz")
        got = {
            (r.cohort_week, r.week_offset): (r.n_users, r.retention_rate)
            for r in retention_cohorts(ev).collect()
        }
        w0, w1 = TS(2024, 1, 1), TS(2024, 1, 8)
        assert got[(w0, 0)] == (2, 1.0)
        assert got[(w0, 1)] == (1, 0.5)
        assert got[(w1, 0)] == (1, 1.0)
        assert len(got) == 3

    def test_max_offset_truncates(self, spark):
        from confluent_data_ingestion_spark.operators.temporal import (
            retention_cohorts,
        )

        rows = [(1, TS(2024, 1, 2)), (1, TS(2024, 3, 2))]
        ev = spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz")
        offs = [
            r.week_offset
            for r in retention_cohorts(ev, max_offset_weeks=4).collect()
        ]
        assert max(offs) <= 4


class TestAnomaly:
    def test_flags_only_outliers(self, spark):
        from confluent_data_ingestion_spark.operators.temporal import (
            anomaly_zscore,
        )

        rows = [(1, float(v)) for v in [10, 10, 10, 10, 10, 10, 10, 10, 100]]
        rows += [(2, 5.0), (2, 5.0)]   # zero variance -> never flagged
        rows += [(3, 7.0)]             # single event -> never flagged
        ev = spark.createDataFrame(rows, "user_id bigint, value double")
        out = anomaly_zscore(ev, threshold=2.0).collect()
        assert len(out) == 1
        assert out[0].user_id == 1 and out[0].value == 100.0
        assert out[0].zscore > 2.0

    def test_single_exchange(self, spark):
        from confluent_data_ingestion_spark.operators.temporal import (
            anomaly_zscore,
        )

        ev = spark.createDataFrame(
            [(1, 1.0), (1, 2.0)], "user_id bigint, value double"
        )
        plan = (
            anomaly_zscore(ev)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1


class TestGopherRules:
    def test_rule_vector(self, spark):
        from confluent_data_ingestion_spark.operators.text import gopher_rules

        docs = spark.createDataFrame(
            [
                (1, "the data is on the table and it is a fast value row"),
                (2, "x y"),                                  # too few words
                (3, "### ## # " + "the a of and to in is it for on"),
                (4, "zz qq ww ee rr tt yy uu ii oo"),         # no stopwords
            ],
            "doc_id bigint, text string",
        )
        rows = {r.doc_id: r for r in gopher_rules(docs).collect()}
        assert rows[1].gopher_pass
        assert not rows[2].rule_word_count and not rows[2].gopher_pass
        assert not rows[3].rule_symbol_ratio or not rows[3].rule_alpha_words
        assert not rows[4].rule_stopword_hits and not rows[4].gopher_pass

    def test_zero_shuffle(self, spark):
        from confluent_data_ingestion_spark.operators.text import gopher_rules

        docs = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
        plan = (
            gopher_rules(docs)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "scd2_user_history", "snapshot_diff_orders", "profile_documents",
        "retention_cohorts_weekly", "event_anomaly_zscore",
        "returned_item_topk", "order_priority_semijoin",
        "ship_latency_distribution", "gopher_quality_gate",
    ],
)
def test_registry_queries_nonempty(spark, sf_dir, name):
    from confluent_data_ingestion_spark.queries import QUERIES

    assert QUERIES[name](spark, sf_dir).limit(1).count() >= 0


class TestScd2ApplyBatch:
    def test_incremental_equals_rebuild(self, spark):
        from confluent_data_ingestion_spark.operators.evolve import (
            scd2_apply_batch, scd2_from_changelog,
        )

        all_rows = [
            (1, TS(2024, 1, 1), 1, "a"),
            (1, TS(2024, 1, 2), 2, "b"),
            (1, TS(2024, 1, 5), 3, "b"),   # unchanged (post-cut)
            (1, TS(2024, 1, 6), 4, "a"),   # revert (post-cut)
            (2, TS(2024, 1, 1), 5, "x"),   # untouched by the batch
            (3, TS(2024, 1, 5), 6, "q"),   # new key arriving in the batch
        ]
        cut = TS(2024, 1, 3)
        ev = _ev(spark, all_rows)
        hist = scd2_from_changelog(
            ev.filter(F.col("ts") <= cut), ["user_id"], "ts", ["attr"],
            tie_breakers=["event_id"],
        )
        incr = scd2_apply_batch(
            hist, ev.filter(F.col("ts") > cut), ["user_id"], "ts", ["attr"]
        )
        full = scd2_from_changelog(
            ev, ["user_id"], "ts", ["attr"], tie_breakers=["event_id"]
        )
        key = lambda r: (r.user_id, r.attr, r.effective_from,  # noqa: E731
                         r.effective_to, r.is_current)
        assert sorted(map(key, incr.collect())) == sorted(
            map(key, full.collect()))

    def test_untouched_keys_pass_through(self, spark):
        from confluent_data_ingestion_spark.operators.evolve import (
            scd2_apply_batch, scd2_from_changelog,
        )

        hist = scd2_from_changelog(
            _ev(spark, [(2, TS(2024, 1, 1), 1, "x")]),
            ["user_id"], "ts", ["attr"],
        )
        batch = _ev(spark, [(1, TS(2024, 1, 9), 2, "n")])
        out = scd2_apply_batch(hist, batch, ["user_id"], "ts", ["attr"])
        rows = {r.user_id: r for r in out.collect()}
        assert rows[2].attr == "x" and rows[2].is_current
        assert rows[1].attr == "n" and rows[1].is_current


class TestCurriculum:
    def test_stage_assignment_and_balance(self, spark):
        from confluent_data_ingestion_spark.operators.sampling import (
            curriculum_plan,
        )

        df = spark.range(100).select(
            F.col("id").alias("doc_id"), F.col("id").alias("score")
        )
        out = curriculum_plan(df, "score")
        sizes = {r.stage: r["count"] for r in
                 out.groupBy("stage").count().collect()}
        # distinct uniform scores -> near-quartile stages
        assert set(sizes) == {1, 2, 3, 4}
        assert all(20 <= v <= 30 for v in sizes.values())
        # monotone: every stage-1 score below every stage-4 score
        s1 = out.filter("stage = 1").agg(F.max("score")).collect()[0][0]
        s4 = out.filter("stage = 4").agg(F.min("score")).collect()[0][0]
        assert s1 < s4

    def test_null_scores_get_null_stage(self, spark):
        from confluent_data_ingestion_spark.operators.sampling import (
            curriculum_plan,
        )

        df = spark.createDataFrame(
            [(1, 10.0), (2, None), (3, 20.0), (4, 30.0), (5, 40.0)],
            "doc_id bigint, score double",
        )
        rows = {r.doc_id: r.stage for r in
                curriculum_plan(df, "score").collect()}
        assert rows[2] is None
        assert all(v is not None for k, v in rows.items() if k != 2)

    def test_no_global_window_in_plan(self, spark):
        from confluent_data_ingestion_spark.operators.sampling import (
            curriculum_plan,
        )

        df = spark.range(10).select(F.col("id").alias("score"))
        plan = (
            curriculum_plan(df, "score")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan

    def test_cuts_validation(self, spark):
        from confluent_data_ingestion_spark.operators.sampling import (
            curriculum_plan,
        )

        df = spark.range(5).select(F.col("id").alias("score"))
        import pytest as _pt
        with _pt.raises(ValueError):
            curriculum_plan(df, "score", cuts=())
        with _pt.raises(ValueError):
            curriculum_plan(df, "score", cuts=(0.5, 0.25))


def test_profile_handles_hostile_column_names(spark):
    from confluent_data_ingestion_spark.operators.evolve import (
        profile_columns,
    )

    df = spark.range(3).select(
        F.col("id").alias("odd'na`me"), F.col("id").alias("b")
    )
    rows = {r.column: r for r in profile_columns(df).collect()}
    assert set(rows) == {"odd'na`me", "b"}
    assert rows["odd'na`me"].n_distinct == 3
