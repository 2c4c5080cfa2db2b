"""Report the driver-graded state (round 8+: nothing to regenerate).

``operators/_graded.py`` was a generated cache of the green rows in
``CORRECTNESS_r*.json``; it went stale at the round boundary in rounds
5, 6 AND 7 because regenerating it was a manual step.  The registry now
derives the graded set live at import via
``operators/graded_state.graded_rounds()`` — this tool remains only as
a human-readable report (and deletes a leftover ``_graded.py`` if one
reappears, so the old workflow can't silently resurrect the cache).

    python tools/regen_graded.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dbt_spark_models_spark.operators.graded_state import graded_rounds  # noqa: E402

# Back-compat for tests/tools that imported compute_graded from here.
from dbt_spark_models_spark.operators.graded_state import compute_graded  # noqa: E402,F401


def main() -> None:
    stale = os.path.join(
        REPO, "dbt_spark_models_spark", "operators", "_graded.py"
    )
    if os.path.exists(stale):
        os.remove(stale)
        print(f"removed stale cache {stale}")
    rounds = graded_rounds()
    by_round: dict[int, int] = {}
    for rnd in rounds.values():
        by_round[rnd] = by_round.get(rnd, 0) + 1
    print(
        f"graded (live from CORRECTNESS_r*.json): {len(rounds)} names; "
        f"by latest-grading round: "
        + ", ".join(f"r{r}={n}" for r, n in sorted(by_round.items()))
    )


if __name__ == "__main__":
    main()
