"""Bucketing = the co-located join strategy at 100 TB: two fact tables
bucketed on the join key sort-merge WITHOUT any Exchange — the shuffle
happens once at write time and is amortized over every subsequent join,
instead of re-paid per query.  This is the layout the store/pipeline
recommends for fact-fact joins (PERF.md); here the property is proven
on disk with real bucketed parquet, not just claimed.
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import sf_dir


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    li = (
        spark.read.parquet(f"{sf_dir()}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
    )
    od = (
        spark.read.parquet(f"{sf_dir()}/orders.parquet")
        .select("o_orderkey", "o_totalprice")
    )
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(tmp_path / "li_b")).mode("overwrite")
        .saveAsTable("li_b")
    )
    (
        od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(tmp_path / "od_b")).mode("overwrite")
        .saveAsTable("od_b")
    )
    yield spark.table("li_b"), spark.table("od_b")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS od_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        assert "SortMergeJoin" in plan
        # and the result is right (vs the plain-parquet join)
        n_plain = (
            spark.read.parquet(f"{sf_dir()}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{sf_dir()}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert j.count() == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    a, _ = bucketed_pair
    agg = a.groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # bucket layout satisfies the agg
