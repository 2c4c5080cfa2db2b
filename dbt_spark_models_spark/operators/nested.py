"""Nested document-data patterns (SURVEY.md §1.2, §2.8, §2.9; FIXTURES.md F4).

The reference's raw sources are Mongo document dumps: deep struct paths
(``ci.jci.pdr.uid``, ``models/spark/mongo/merchant_order.sql:34``), arrays
of structs traversed with lambda chains
(``ELEMENT_AT(TRANSFORM(FILTER(st.st, e -> e.s == 0), x -> x.t), 1)``,
``merchant_order.sql:23-26``), NAMED_STRUCT rebuilds (``:13-16``), and
INLINE table-generation (``models/spark/dashboards/user_points_transactions.sql:76``).

The driver testdata has no nested columns, so these queries BUILD the
nested shapes from lineitem (deterministically) and then traverse them —
both construction and traversal are exercised, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables

# array<struct<s,t>> per order: status code s = linenumber % 3,
# t = shipdate; ordered by linenumber (ln) then the ln key is dropped —
# mirroring a Mongo status-history array
_DUCK_ST = """
    SELECT l_orderkey,
           list_transform(
               list_sort(list({'ln': l_linenumber,
                               's': l_linenumber % 3,
                               't': l_shipdate})),
               x -> {'s': x.s, 't': x.t}) AS st
    FROM lineitem GROUP BY l_orderkey
"""


def _order_status_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.groupBy("l_orderkey").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("ln"),
                        (F.col("l_linenumber") % 3).alias("s"),
                        F.col("l_shipdate").alias("t"),
                    )
                )
            ),
            lambda x: F.struct(x.getField("s").alias("s"), x.getField("t").alias("t")),
        ).alias("st")
    )


@query(
    "nested_status_history_traversal",
    oracle=f"""
WITH per AS ({_DUCK_ST})
SELECT l_orderkey,
       len(st) AS n_status,
       list_transform(list_filter(st, e -> e.s = 0), x -> x.t)[1]
           AS first_status0_ts,
       len(list_filter(st, e -> e.s = 0)) AS n_status0,
       st[-1].t AS last_status_ts,
       st[1].s AS first_status_code
FROM per
""",
)
def nested_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merchant_order status-history idiom: build array<struct<s,t>>,
    then ELEMENT_AT(TRANSFORM(FILTER(st, e -> e.s == 0), x -> x.t), 1)
    (reference ``models/spark/mongo/merchant_order.sql:23-26``).

    Plan (r11, guide §2.3 "aggregate before you shuffle"): the five
    traversal outputs are ORDINARY aggregates over the (unique-per-order)
    line number — struct-min/max picks the first/last element the sorted
    array held — so the partially-aggregated groupBy ships one row per
    order per map task instead of collect_list shipping every element,
    and the per-row interpreted array HOFs disappear. Values identical:
    l_linenumber is unique within an order, so min/max over (ln, ...)
    structs select exactly the array's first/last entries."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    s = (F.col("l_linenumber") % 3).alias("s")
    ln = F.col("l_linenumber")
    t = F.col("l_shipdate")
    s0 = F.when(s == 0, F.struct(ln.alias("ln"), t.alias("t")))
    return li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("int").alias("n_status"),
        F.min(s0).getField("t").alias("first_status0_ts"),
        F.sum(F.when(s == 0, 1).otherwise(0)).cast("int").alias("n_status0"),
        F.max(F.struct(ln.alias("ln"), t.alias("t")))
        .getField("t")
        .alias("last_status_ts"),
        F.min(F.struct(ln.alias("ln"), s.alias("s")))
        .getField("s")
        .alias("first_status_code"),
    )


@query(
    "nested_inline_status_rows",
    oracle=f"""
WITH per AS ({_DUCK_ST})
SELECT l_orderkey, u.s AS status_code, u.t AS status_ts
FROM (SELECT l_orderkey, unnest(st) AS u FROM per WHERE l_orderkey % 5 = 0)
""",
)
def nested_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INLINE(array<struct>) → columns (reference
    ``models/spark/b2b_mart/ss/ss_events_startsession.sql:59``)."""
    per = _order_status_arrays(spark, sf_dir).filter(F.col("l_orderkey") % 5 == 0)
    return per.select("l_orderkey", F.inline("st")).select(
        "l_orderkey",
        F.col("s").alias("status_code"),
        F.col("t").alias("status_ts"),
    )


@query(
    "nested_deep_struct_paths",
    oracle="""
SELECT o_orderkey,
       {'header': {'cust': {'uid': o_custkey, 'status': o_orderstatus},
                   'placed': o_orderdate},
        'money': {'total_micros': CAST(ROUND(o_totalprice * 1000000) AS BIGINT)}}
           .header.cust.uid AS deep_uid,
       {'header': {'cust': {'uid': o_custkey, 'status': o_orderstatus},
                   'placed': o_orderdate},
        'money': {'total_micros': CAST(ROUND(o_totalprice * 1000000) AS BIGINT)}}
           .money.total_micros AS total_micros,
       ROUND(CAST(ROUND(o_totalprice * 1000000) AS BIGINT) / 1000000.0, 2)
           AS total_from_micros
FROM orders
WHERE o_orderkey % 7 = 0
""",
)
def nested_deep_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NAMED_STRUCT rebuild + deep path access (``ci.jci.pdr.uid``,
    reference ``merchant_order.sql:34``) + the integer-micros money
    convention ÷1e6 → DOUBLE (``merchant_order.sql:47-60``)."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    doc = F.struct(
        F.struct(
            F.struct(
                F.col("o_custkey").alias("uid"),
                F.col("o_orderstatus").alias("status"),
            ).alias("cust"),
            F.col("o_orderdate").alias("placed"),
        ).alias("header"),
        F.struct(
            F.round(F.col("o_totalprice") * 1000000)
            .cast("long")
            .alias("total_micros")
        ).alias("money"),
    )
    return (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("doc", doc)
        .select(
            "o_orderkey",
            F.col("doc.header.cust.uid").alias("deep_uid"),
            F.col("doc.money.total_micros").alias("total_micros"),
            F.round(F.col("doc.money.total_micros") / 1000000.0, 2).alias(
                "total_from_micros"
            ),
        )
    )


@query(
    "window_collect_set_running",
    oracle="""
SELECT e.event_id, e.user_id,
       (SELECT array_to_string(list_sort(list(DISTINCT e2.event_type)), ',')
        FROM events e2
        WHERE e2.user_id = e.user_id
          AND (e2.ts < e.ts OR (e2.ts = e.ts AND e2.event_id <= e.event_id)))
           AS types_seen_so_far
FROM events e
WHERE e.user_id < 20
""",
)
def window_collect_set_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLECT_SET as a WINDOW function (reference
    ``models/spark/engagement/user_segments.sql:18-20``) — running distinct
    set of event types per user, normalized to a sorted string."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"].filter(
        F.col("user_id") < 20
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.array_join(
            F.array_sort(F.collect_set("event_type").over(w)), ","
        ).alias("types_seen_so_far"),
    )
