"""Skew mitigation patterns (build brief: "skewed keys -> salting or AQE
skew-join") as verifiable operators.

Both queries produce BIT-IDENTICAL results to their unsalted oracles —
salting changes the shuffle layout, never the answer — so the hash gate
proves the rewrite is sound. Exact DECIMAL partial sums keep the two-phase
aggregation order-insensitive (double addition is not associative; decimal
is).

The ``events`` table is the natural skew fixture: a handful of event_type
values over millions of rows — a groupBy(event_type) shuffles the whole
fact onto ~5 reducers without salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark_models_spark.operators import query
from dbt_spark_models_spark.sources.testdata import load_tables

_SALT_K = 16


@query(
    "skew_salted_two_phase_agg",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
           AS total_value
FROM events
GROUP BY event_type
""",
)
def skew_salted_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation via salting: phase 1 groups by
    ``(event_type, xxhash64(user_id, ts) % 16)`` so each hot key spreads
    over 16 reducers; phase 2 merges the 16 partials per key (a
    16-rows-per-key shuffle, trivially balanced). COUNT(DISTINCT user_id)
    re-aggregates the phase-1 distinct sets via a user_id-salted grouping
    (distinct-by-(key, user) first — itself the standard skew-safe
    count-distinct expansion). Decimal partial sums make the two-phase
    total exactly equal the one-phase oracle.

    At 100 TB this is THE pattern for low-cardinality rollups; Spark's
    partial aggregation does the same implicitly for algebraic functions,
    but explicit salting also covers the non-algebraic cases (exact
    distinct, collect) where map-side combine can't help."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    salted = e.select(
        "event_type",
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("value"),
        F.pmod(F.xxhash64("user_id", "ts"), F.lit(_SALT_K)).alias("salt"),
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("value").alias("pv"),
    )
    counts = partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.round(F.sum("pv").cast("double"), 2).alias("total_value"),
    )
    # exact distinct users per hot key: distinct (key, user) pairs first —
    # user_id is high-cardinality, so THIS shuffle is balanced — then a
    # plain count per key
    du = (
        e.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return counts.join(du, "event_type").select(
        "event_type", "n_events", "n_users", "total_value"
    )


@query(
    "skew_salted_replicated_join",
    oracle="""
WITH c AS (
    SELECT event_type, category, weight FROM (
        VALUES ('view','browse',1), ('click','browse',2),
               ('purchase','commerce',10), ('signup','account',5),
               ('error','system',0)
    ) AS t(event_type, category, weight)
)
SELECT c.category,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,2)) * c.weight) AS DOUBLE), 2)
           AS weighted_value
FROM events e JOIN c ON e.event_type = c.event_type
GROUP BY c.category
""",
)
def skew_salted_replicated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe shuffle join via small-side replication: the dimension is
    exploded ×16 (one copy per salt), the fact tags each row with
    ``xxhash64(user_id, ts) % 16``, and the join key becomes
    ``(event_type, salt)`` — a hot event_type now lands on 16 reducers
    instead of one. Result is provably identical to the plain join (each
    fact row still matches exactly one dimension copy).

    Spark would broadcast THIS tiny dimension anyway (and AQE skew-join
    splits oversized partitions at runtime); the salted form is the
    explicit, planner-independent pattern for when the skewed join's build
    side is too big to broadcast — so the join is forced to shuffle here
    to make the demonstrated plan the one under test."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    dim = spark.createDataFrame(
        [
            ("view", "browse", 1),
            ("click", "browse", 2),
            ("purchase", "commerce", 10),
            ("signup", "account", 5),
            ("error", "system", 0),
        ],
        "event_type string, category string, weight int",
    )
    dim_rep = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT_K - 1)))
    )
    fact = e.select(
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("value"),
        F.pmod(F.xxhash64("user_id", "ts"), F.lit(_SALT_K)).alias("salt"),
    )
    joined = fact.join(
        dim_rep.hint("shuffle_hash"), ["event_type", "salt"]
    )
    return joined.groupBy("category").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value") * F.col("weight")).cast("double"), 2).alias(
            "weighted_value"
        ),
    )


def _morton_spark(xcol: str, ycol: str, bits: int = 16):
    """Interleave the low ``bits`` of two ints: x in even positions, y in
    odd — pure integer expression, identical in any engine."""
    terms = []
    for b in range(bits):
        terms.append(f"(((({xcol}) >> {b}) & 1) << {2 * b})")
        terms.append(f"(((({ycol}) >> {b}) & 1) << {2 * b + 1})")
    return F.expr(" + ".join(terms))


def _morton_duck(xcol: str, ycol: str, bits: int = 16) -> str:
    terms = []
    for b in range(bits):
        terms.append(f"(((({xcol}) >> {b}) & 1) << {2 * b})")
        terms.append(f"(((({ycol}) >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


@query(
    "layout_zorder_morton_buckets",
    oracle=f"""
WITH k AS (
    SELECT user_id,
           CAST(user_id % 256 AS BIGINT) AS xk,
           CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 256 AS BIGINT) AS yk
    FROM events
), m AS (
    SELECT user_id, xk, yk, {_morton_duck("xk", "yk", 8)} AS morton FROM k
)
SELECT CAST(morton >> 8 AS BIGINT) AS zbucket,
       COUNT(*) AS n_rows,
       CAST(MIN(morton) AS BIGINT) AS min_morton,
       CAST(MAX(morton) AS BIGINT) AS max_morton,
       COUNT(DISTINCT user_id) AS n_users
FROM m GROUP BY zbucket
""",
)
def layout_zorder_morton_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering keys for multi-column data skipping: interleave
    the bits of (user_id, day) into a Morton code, then range-bucket on
    it — rows close in BOTH dimensions land in the same file, so min/max
    footer stats prune scans filtered on either column (the open-source
    equivalent of Delta OPTIMIZE ZORDER, done at write time with
    ``repartitionByRange(morton)``). The gate verifies the interleave
    arithmetic and the bucket histogram exactly; the bit-twiddling is the
    same integer expression in both engines.

    Scale: the morton key is row-local math fused into the scan; the only
    exchange is the range partition you were going to do anyway to lay
    out files."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    k = ev.select(
        "user_id",
        (F.col("user_id") % 256).cast("long").alias("xk"),
        (F.unix_date(F.col("ts").cast("date")) % 256).cast("long").alias("yk"),
    )
    m = k.withColumn("morton", _morton_spark("xk", "yk", 8))
    zbucket = F.shiftright(F.col("morton"), 8).cast("long")
    return m.groupBy(zbucket.alias("zbucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("morton").cast("long").alias("min_morton"),
        F.max("morton").cast("long").alias("max_morton"),
        F.countDistinct("user_id").alias("n_users"),
    )
