"""Round-6 operator invariants: label propagation, histogram stump,
average precision, distributed running sum."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from dbt_spark_models_spark.sources.testdata import load_tables


def test_label_propagation_partitions_nodes(spark, sf_dir):
    """Communities partition the node set exactly: member counts sum to
    the number of graph nodes, every community label is itself a node,
    and the deterministic tie-break makes reruns bit-identical."""
    from dbt_spark_models_spark.operators.clustering import (
        graph_label_propagation,
    )

    out = graph_label_propagation(spark, sf_dir).collect()
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    e = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_totalprice") >= 450000),
            t["lineitem"].l_orderkey == t["orders"].o_orderkey,
        )
        .select("l_suppkey", "o_custkey")
        .distinct()
    )
    n_nodes = (
        e.select(F.concat(F.lit("s"), F.col("l_suppkey")).alias("n"))
        .unionAll(e.select(F.concat(F.lit("c"), F.col("o_custkey")).alias("n")))
        .distinct()
        .count()
    )
    assert sum(r["n_members"] for r in out) == n_nodes
    labels = {r["community"] for r in out}
    assert all(lab[0] in ("s", "c") for lab in labels)
    rerun = graph_label_propagation(spark, sf_dir).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, rerun))


def test_decision_stump_split_is_argmin(spark, sf_dir):
    """The published split must (a) partition the full order count,
    (b) carry a weighted Gini in [0, 0.5], and (c) actually be the
    minimum over every candidate boundary (recomputed driver-side from
    the raw histogram)."""
    from dbt_spark_models_spark.operators.quality import (
        train_decision_stump_histogram,
    )

    r = train_decision_stump_histogram(spark, sf_dir).collect()[0]
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    total = o.count()
    assert r["n_left"] + r["n_right"] == total
    assert 0.0 <= r["gini"] <= 0.5
    hist = (
        o.select(
            F.floor(F.col("o_totalprice") / 10000).cast("long").alias("bin"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("y"),
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"))
        .orderBy("bin")
        .collect()
    )
    nt = sum(h["n"] for h in hist)
    post = sum(h["pos"] for h in hist)
    best = None
    nl = posl = 0
    for h in hist:
        nl += h["n"]
        posl += h["pos"]
        nr, posr = nt - nl, post - posl
        if nl == 0 or nr == 0:
            continue
        gl = 1 - (posl / nl) ** 2 - ((nl - posl) / nl) ** 2
        gr = 1 - (posr / nr) ** 2 - ((nr - posr) / nr) ** 2
        g = round((nl * gl + nr * gr) / nt, 6)
        if best is None or (g, h["bin"]) < best:
            best = (g, h["bin"])
    assert (r["gini"], r["split_bin"]) == best


def test_average_precision_matches_driver_recompute(spark, sf_dir):
    """AP recomputed driver-side from the bucketed (score, y) pairs with
    the identical step-wise definition must match the distributed value,
    and sit in (0, 1] with the positive rate as its lower bound."""
    from dbt_spark_models_spark.operators.quality import (
        eval_average_precision,
    )

    from dbt_spark_models_spark.operators.text import _tokens
    from dbt_spark_models_spark.sources.testdata import spread

    r = eval_average_precision(spark, sf_dir).collect()[0]
    assert 0.0 < r["average_precision"] <= 1.0
    d = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    n_tok = F.size("tokens")
    rows = (
        d.withColumn("tokens", _tokens())
        .filter(n_tok > 0)
        .select(
            F.round(
                F.log(F.lit(1) + n_tok) * 0.5
                + (F.size(F.array_distinct("tokens")) / n_tok) * 1.5
                - (
                    F.size(F.filter("tokens", lambda x: x.rlike("^[0-9]+$")))
                    / n_tok
                )
                * 3.0,
                6,
            ).alias("s"),
            F.when(F.col("lang").isin("en", "es"), 1).otherwise(0).alias("y"),
        )
        .collect()
    )
    buckets: dict = {}
    for row in rows:
        np_, n_ = buckets.get(row["s"], (0, 0))
        buckets[row["s"]] = (np_ + row["y"], n_ + 1)
    tot_pos = sum(v[0] for v in buckets.values())
    tot = sum(v[1] for v in buckets.values())
    cpos = cn = 0
    ap = 0.0
    for s in sorted(buckets, reverse=True):
        np_, n_ = buckets[s]
        cpos += np_
        cn += n_
        ap += (np_ / tot_pos) * (cpos / cn)
    assert (r["n_pos"], r["n"]) == (tot_pos, tot)
    assert abs(r["average_precision"] - ap) < 1e-6


def test_distributed_cumsum_equals_window(spark, sf_dir):
    """distributed_cumsum must be bit-identical to the single-partition
    SUM() OVER (ORDER BY ...) it replaces, for every row. Exact (integer/
    decimal) value types only — float addition is not associative, so the
    offset decomposition (like any partial-agg plan) can differ in ulps;
    callers needing cross-engine determinism sum exact types (see
    pipeline_llm_data_curation's BIGINT token counts)."""
    from dbt_spark_models_spark.operators.windows import distributed_cumsum

    o = load_tables(spark, sf_dir, ("orders",))["orders"].select(
        "o_orderkey",
        (F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    got = {
        r["o_orderkey"]: r["cs"]
        for r in distributed_cumsum(o, ["o_orderkey"], "v", "cs").collect()
    }
    w = (
        Window.partitionBy(F.col("o_orderkey").isNotNull())
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["o_orderkey"]: r["cs"]
        for r in o.withColumn("cs", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_distributed_cumsum_plan_has_no_global_window(spark, sf_dir):
    """The plan must range-partition and never run a window over an
    unpartitioned (single-partition) exchange of the full input. The
    range exchange now sits INSIDE the localCheckpoint (r7: the ranged
    intermediate materializes as Scan ExistingRDD — r6 ADVICE #4), so
    range partitioning is proven BEHAVIORALLY: the output's partitions
    (preserved through the broadcast join) must hold disjoint,
    increasing key ranges — exactly what a single-partition plan or a
    hash exchange could not produce."""
    from dbt_spark_models_spark.operators.windows import distributed_cumsum

    o = load_tables(spark, sf_dir, ("orders",))["orders"].select(
        "o_orderkey", F.col("o_totalprice").alias("v")
    )
    out = distributed_cumsum(o, ["o_orderkey"], "v", "cs", _keep_pid=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "singlepartition" not in plan.lower()
    assert "existingrdd" in plan.lower()  # materialized ranged intermediate
    ranges = sorted(
        (r["__pid"], r["lo"], r["hi"])
        for r in out.groupBy("__pid")
        .agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
        .collect()
    )
    assert len(ranges) > 1, "range shuffle collapsed to one partition"
    for (_, _, prev_hi), (_, lo, _) in zip(ranges, ranges[1:]):
        assert prev_hi < lo, f"overlapping ranges: {ranges}"


def test_ndcg_bounds_and_ideal(spark, sf_dir):
    """NDCG must sit in (0, 1]; DCG <= IDCG by construction; and the
    ideal ranking of a corpus with >= 20 rel=2 docs has IDCG equal to
    the closed-form all-2s discount sum."""
    from dbt_spark_models_spark.operators.quality import (
        eval_ndcg_quality_ranking,
    )

    r = eval_ndcg_quality_ranking(spark, sf_dir).collect()[0]
    assert 0.0 < r["ndcg_20"] <= 1.0
    assert r["dcg_20"] <= r["idcg_20"] + 1e-9
    from dbt_spark_models_spark.sources.testdata import load_tables as lt

    d = lt(spark, sf_dir, ("documents",))["documents"]
    n_en = d.filter(F.col("lang") == "en").count()
    if n_en >= 20:
        import math

        ideal = sum(3.0 / math.log2(i + 1) for i in range(1, 21))
        assert abs(r["idcg_20"] - round(ideal, 6)) < 1e-5


def test_naive_bayes_logprobs_normalized(spark, sf_dir):
    """Per class: exactly 5 rows ranked 1..5, log-probs strictly
    negative and non-increasing with rank (count-desc ordering)."""
    from dbt_spark_models_spark.operators.quality import (
        train_naive_bayes_tokens,
    )

    rows = train_naive_bayes_tokens(spark, sf_dir).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == [1, 2, 3, 4, 5]
        lps = [r["logprob"] for r in rs]
        assert all(lp < 0 for lp in lps)
        assert all(a >= b - 1e-12 for a, b in zip(lps, lps[1:]))


def test_link_prediction_pairs_valid(spark, sf_dir):
    """Every published pair: u < w, jaccard in (0, 1], common <= both
    degrees, and the list is sorted by (jaccard desc, u, w)."""
    from dbt_spark_models_spark.operators.clustering import (
        graph_jaccard_link_prediction,
    )

    rows = graph_jaccard_link_prediction(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    keys = [(-r["jaccard"], r["u"], r["w"]) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r["u"] < r["w"]
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["common"] >= 1


def test_pareto_frontier_is_undominated(spark, sf_dir):
    """No frontier point may dominate another (strictly shorter AND at
    least as diverse, or same length and more diverse), and diversity
    must be strictly increasing with length along the frontier."""
    from dbt_spark_models_spark.operators.curation import (
        curation_pareto_frontier,
    )

    rows = curation_pareto_frontier(spark, sf_dir).collect()
    assert rows
    qs = [r["q"] for r in rows]
    ns = [r["n_tokens"] for r in rows]
    assert ns == sorted(ns)
    # along the frontier, strictly longer => strictly higher diversity
    for (n1, q1), (n2, q2) in zip(zip(ns, qs), zip(ns[1:], qs[1:])):
        if n2 > n1:
            assert q2 > q1


def test_brier_decomposition_identity(spark, sf_dir):
    """Murphy identity: reliability − resolution + uncertainty = Brier
    (exact with equal-p bins, up to the published 1e-6 rounding), and
    every component within its theoretical range."""
    from dbt_spark_models_spark.operators.quality import (
        eval_brier_decomposition,
    )

    r = eval_brier_decomposition(spark, sf_dir).collect()[0]
    assert 0.0 <= r["brier"] <= 1.0
    assert 0.0 <= r["reliability"]
    assert 0.0 <= r["resolution"] <= 0.25 + 1e-9
    assert 0.0 <= r["uncertainty"] <= 0.25 + 1e-9
    lhs = r["reliability"] - r["resolution"] + r["uncertainty"]
    assert abs(lhs - r["brier"]) < 3e-6
