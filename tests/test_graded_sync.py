"""Guard for the r5/r6 recurring defect: operators/_graded.py must stay
in sync with the driver's CORRECTNESS_r*.json files.  When the driver
drops a new correctness file, `python tools/regen_graded.py` must be run
— otherwise load_all()'s rotation puts already-green queries back at the
registry front and the driver wastes its per-round grading budget
re-grading them (this exact failure recurred in rounds 5 AND 6)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_graded_file_matches_correctness_artifacts():
    from dbt_spark_models_spark.operators._graded import DRIVER_GRADED
    from tools.regen_graded import compute_graded

    expected = compute_graded()
    missing = expected - DRIVER_GRADED
    stale = DRIVER_GRADED - expected
    assert not missing and not stale, (
        f"operators/_graded.py out of sync with CORRECTNESS_r*.json — run "
        f"`python tools/regen_graded.py`. missing={sorted(missing)[:10]} "
        f"stale={sorted(stale)[:10]}"
    )


def test_graded_names_exist_in_registry():
    from dbt_spark_models_spark.operators import load_all
    from dbt_spark_models_spark.operators._graded import DRIVER_GRADED

    registry = load_all()
    ghosts = DRIVER_GRADED - set(registry)
    assert not ghosts, f"graded names not in registry: {sorted(ghosts)[:10]}"
