"""Guards for the registry's driver-grading rotation.

Rounds 5-7 recurring defect: a generated ``operators/_graded.py`` cache
went stale whenever the driver dropped a new ``CORRECTNESS_r*.json``.
Round 8 removed the cache — ``load_all()`` now derives the graded set
live from the artifacts via ``operators/graded_state`` — so these tests
assert the structural properties the rotation must keep:

1. no generated cache file exists (it must not silently come back);
2. every never-graded query sorts ahead of every graded query;
3. graded queries are ordered oldest-grading-round first (staleness
   rotation — driver slots become regression insurance, VERDICT r7 #2);
4. every graded name exists in the registry (no ghosts).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_no_generated_graded_cache():
    assert not os.path.exists(
        os.path.join(REPO, "dbt_spark_models_spark", "operators", "_graded.py")
    ), "_graded.py cache resurrected — graded state must derive live from artifacts"


def test_registry_rotation_ungraded_first_then_stalest():
    from dbt_spark_models_spark.operators import load_all
    from dbt_spark_models_spark.operators.graded_state import graded_rounds

    rounds = graded_rounds()
    names = list(load_all())
    graded_flags = [n in rounds for n in names]
    # Property 2: once the graded block starts, it never goes back.
    first_graded = graded_flags.index(True) if True in graded_flags else len(names)
    assert all(graded_flags[first_graded:]), (
        "ungraded query found behind a graded one — rotation broken"
    )
    # Property 3 (r12): rewritten-since-last-grade queries lead the
    # graded block (their grade on file predates the code that now runs,
    # so their staleness number under-states their risk — r11 VERDICT
    # next-round #3); after them, the block is non-decreasing in grading
    # round (staleness rotation).
    from dbt_spark_models_spark.operators import _REGRADE_FIRST

    graded_names = names[first_graded:]
    n_regrade = sum(1 for n in graded_names if n in _REGRADE_FIRST)
    head, tail = graded_names[:n_regrade], graded_names[n_regrade:]
    assert all(n in _REGRADE_FIRST for n in head), (
        "a merely-stale graded query sorted ahead of a rewritten one"
    )
    tail_seq = [rounds[n] for n in tail]
    assert tail_seq == sorted(tail_seq), (
        "graded queries not in oldest-grade-first order after the "
        "regrade-first block"
    )


def test_graded_names_exist_in_registry():
    from dbt_spark_models_spark.operators import load_all
    from dbt_spark_models_spark.operators.graded_state import compute_graded

    registry = load_all()
    ghosts = compute_graded() - set(registry)
    assert not ghosts, f"graded names not in registry: {sorted(ghosts)[:10]}"
