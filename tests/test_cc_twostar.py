"""Two-star connected components on adversarial graph shapes — the cases
where plain label propagation needs diameter-many rounds."""

def _components(spark, edges, max_rounds=20):
    from dbt_spark_models_spark.operators.clustering import two_star_components

    df = spark.createDataFrame(edges, "u LONG, v LONG")
    return {
        (r.doc_id, r.cluster_id)
        for r in two_star_components(df, max_rounds=max_rounds).collect()
    }


def test_path_graph_collapses_in_logarithmic_rounds(spark):
    # 0-1-2-...-40: diameter 40; label-prop would need 40 rounds, the
    # two-star fixpoint must land within the log² bound (max_rounds=7
    # rounds of large+small star for 41 nodes)
    n = 41
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _components(spark, edges, max_rounds=7)
    assert got == {(i, 0) for i in range(n)}


def test_two_components_and_a_star(spark):
    edges = [(5, 9), (9, 7), (100, 200), (100, 300), (100, 400)]
    got = _components(spark, edges)
    assert got == {
        (5, 5), (9, 5), (7, 5),
        (100, 100), (200, 100), (300, 100), (400, 100),
    }


def test_matches_label_propagation_on_random_graph(spark):
    import random

    rng = random.Random(7)
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(50)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = _components(spark, edges)
    # reference: pure-python union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(x, find(x)) for x in parent}
    assert got == want
