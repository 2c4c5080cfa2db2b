"""r12: the fused similarity_pq_adc_topk must match the superseded r11
Arrow form row-for-row (the r11 form itself was oracle-verified), and its
plan must keep the fused shape — two MapInArrow scans, no persisted sub
table, no corpus-scale broadcast-join ADC."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def spark():
    from dbt_spark_models_spark.session import get_spark

    return get_spark("test_pq_adc_fused")


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")


def test_fused_matches_r11_form(spark):
    from dbt_spark_models_spark.operators.similarity import (
        _pq_adc_topk_r11,
        similarity_pq_adc_topk,
    )

    new = sorted(tuple(r) for r in similarity_pq_adc_topk(spark, SF_DIR).collect())
    old = sorted(tuple(r) for r in _pq_adc_topk_r11(spark, SF_DIR).collect())
    spark.catalog.clearCache()
    assert new == old
    assert len(new) == 15  # 5 queries x top-3


def test_fused_plan_shape(spark):
    from dbt_spark_models_spark.operators.similarity import similarity_pq_adc_topk

    df = similarity_pq_adc_topk(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()
    # the candidate side reaching the final window is per-task top-3s from
    # the second Arrow pass — no broadcast-join ADC, no InMemoryRelation
    assert "MapInArrow" in plan
    assert "InMemoryTableScan" not in plan
    assert "BroadcastHashJoin" not in plan
