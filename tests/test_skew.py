"""Skew utilities: salted aggregation / join must equal the plain forms."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from tin_terrain_spark.session import get_spark

    s = get_spark("skew", cores=8)
    yield s
    s.stop()


def test_salted_agg_equals_plain(spark):
    import pyspark.sql.functions as F

    from tin_terrain_spark.operators.skew import salted_agg

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plain = {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["s"],
            r["c"],
            r["mn"],
            r["mx"],
            r["av"],
        )
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
            F.avg("l_discount").alias("av"),
        )
        .collect()
    }
    salted = {
        (r["l_returnflag"], r["l_linestatus"]): (
            r["l_quantity_sum"],
            r["l_quantity_count"],
            r["l_extendedprice_min"],
            r["l_extendedprice_max"],
            r["l_discount_avg"],
        )
        for r in salted_agg(
            li,
            ["l_returnflag", "l_linestatus"],
            {
                "l_quantity": "sum",
                "l_extendedprice": "min",
            },
            salt_buckets=16,
            salt_source="l_orderkey",
        )
        .join(
            salted_agg(
                li,
                ["l_returnflag", "l_linestatus"],
                {"l_extendedprice": "max", "l_discount": "avg"},
                salt_buckets=16,
                salt_source="l_orderkey",
            ),
            ["l_returnflag", "l_linestatus"],
        )
        .join(
            salted_agg(
                li,
                ["l_returnflag", "l_linestatus"],
                {"l_quantity": "count"},
                salt_buckets=16,
                salt_source="l_orderkey",
            ),
            ["l_returnflag", "l_linestatus"],
        )
        .collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        ps, pc, pmn, pmx, pav = plain[k]
        ss, sc, smn, smx, sav = salted[k]
        assert abs(ps - ss) < 1e-6
        assert pc == sc
        assert pmn == smn
        assert pmx == smx
        assert abs(pav - sav) < 1e-9


def test_salted_join_equals_plain(spark):
    import pyspark.sql.functions as F

    from tin_terrain_spark.operators.skew import salted_join

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(orders, "l_orderkey").count()
    salted = salted_join(li, orders, "l_orderkey", replicas=8).count()
    assert plain == salted
