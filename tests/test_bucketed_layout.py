"""Bucketed layout: joining two tables bucketed on the join key
must plan with ZERO Exchange nodes — the write-time shuffle replaces every
query-time shuffle, the layout q17's docstring prescribes for 100 TB."""

from pyspark.sql import functions as F

from supermusr_data_pipeline_spark.operators.bucketed import write_bucketed
from supermusr_data_pipeline_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def _sides(spark):
    ev = load_table(spark, SF_DIR, "events")

    def side(etype, n_name):
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
            .agg(F.count("*").alias(n_name))
        )

    return side("view", "n_views"), side("purchase", "n_purchases")


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    views, purchases = _sides(spark)
    write_bucketed(views, "t_bkt_views", ["user_id", "day"], 8, str(tmp_path / "v"))
    write_bucketed(
        purchases, "t_bkt_purch", ["user_id", "day"], 8, str(tmp_path / "p")
    )
    try:
        v = spark.table("t_bkt_views")
        p = spark.table("t_bkt_purch").withColumnsRenamed(
            {"user_id": "p_user_id", "day": "p_day"}
        )
        # at sf0.001 the optimizer would broadcast the tiny side; hint the
        # 100 TB strategy (merge) so the plan under test is the fact-fact one
        joined = v.hint("merge").join(
            p, (v.user_id == p.p_user_id) & (v.day == p.p_day)
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # and the answer is the answer: same rows as the unbucketed join
        expect = views.join(
            purchases.withColumnsRenamed({"user_id": "p_user_id", "day": "p_day"}),
            (views.user_id == F.col("p_user_id")) & (views.day == F.col("p_day")),
        ).count()
        assert joined.count() == expect > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_views")
        spark.sql("DROP TABLE IF EXISTS t_bkt_purch")
