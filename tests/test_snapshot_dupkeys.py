"""SCD2 with duplicate-key input batches (SURVEY §7 'what's hard'):
the snapshot must keep exactly one deterministic row per key instead of
multiplying current rows through the full-outer merge."""

import pyspark.sql.functions as F


def _fresh_db(spark, db):
    import shutil

    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    shutil.rmtree(f"/tmp/spark_models_engine/{db}", ignore_errors=True)
    spark.sql(f"CREATE DATABASE {db} LOCATION '/tmp/spark_models_engine/{db}'")


def test_duplicate_keys_collapse_to_latest(spark):
    from dbt_spark_models_spark.plans.snapshots import snapshot

    db = "snap_dupkeys"
    _fresh_db(spark, db)
    cfg = dict(unique_key="id", strategy="timestamp", updated_at="upd")
    b1 = spark.createDataFrame(
        [
            (1, "old", "2024-01-01 00:00:00"),
            (1, "new", "2024-01-02 00:00:00"),  # same key, newer → wins
            (2, "only", "2024-01-01 00:00:00"),
        ],
        "id INT, val STRING, upd STRING",
    ).withColumn("upd", F.col("upd").cast("timestamp"))
    snapshot(spark, "t", b1, cfg, db)
    t = spark.table(f"{db}.t")
    assert t.count() == 2
    assert t.filter("id = 1").select("val").first()[0] == "new"

    # batch 2 with duplicates again: key 1 gets two candidate updates,
    # the newer one must become the single new version
    b2 = spark.createDataFrame(
        [
            (1, "v3", "2024-01-03 00:00:00"),
            (1, "v4", "2024-01-04 00:00:00"),
            (2, "only", "2024-01-01 00:00:00"),
        ],
        "id INT, val STRING, upd STRING",
    ).withColumn("upd", F.col("upd").cast("timestamp"))
    snapshot(spark, "t", b2, cfg, db)
    t = spark.table(f"{db}.t")
    cur = t.filter("dbt_valid_to IS NULL AND id = 1").collect()
    assert len(cur) == 1 and cur[0]["val"] == "v4"
    closed = t.filter("dbt_valid_to IS NOT NULL AND id = 1").collect()
    assert len(closed) == 1 and closed[0]["val"] == "new"


def test_equal_updated_at_ties_are_deterministic(spark):
    from dbt_spark_models_spark.plans.snapshots import snapshot

    cfg = dict(unique_key="id", strategy="timestamp", updated_at="upd")
    rows = [
        (1, "aaa", "2024-01-01 00:00:00"),
        (1, "bbb", "2024-01-01 00:00:00"),  # exact tie → content-hash order
    ]
    picked = []
    for i, order in enumerate((rows, rows[::-1])):
        db = f"snap_tie_{i}"
        _fresh_db(spark, db)
        b = spark.createDataFrame(
            order, "id INT, val STRING, upd STRING"
        ).withColumn("upd", F.col("upd").cast("timestamp"))
        snapshot(spark, "t", b, cfg, db)
        picked.append(spark.table(f"{db}.t").select("val").first()[0])
    assert picked[0] == picked[1]  # input order must not matter


def test_null_shifted_ties_are_deterministic(spark):
    """(a, NULL, b) vs (a, b, NULL): concat_ws drops NULLs, so a naive row
    hash makes these distinct rows collide and the tie-break degenerate to
    input order. The null-sentinel encoding must keep them distinct."""
    from dbt_spark_models_spark.plans.snapshots import snapshot

    cfg = dict(unique_key="id", strategy="timestamp", updated_at="upd")
    rows = [
        (1, None, "x", "2024-01-01 00:00:00"),
        (1, "x", None, "2024-01-01 00:00:00"),  # tie; differs only by NULL slot
    ]
    picked = []
    for i, order in enumerate((rows, rows[::-1])):
        db = f"snap_nulltie_{i}"
        _fresh_db(spark, db)
        b = spark.createDataFrame(
            order, "id INT, a STRING, b STRING, upd STRING"
        ).withColumn("upd", F.col("upd").cast("timestamp"))
        snapshot(spark, "t", b, cfg, db)
        picked.append(spark.table(f"{db}.t").select("a", "b").first())
    assert picked[0] == picked[1]  # input order must not matter
