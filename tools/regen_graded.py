"""Regenerate operators/_graded.py from the driver's CORRECTNESS_r*.json
files (run at the start of each round so load_all()'s rotation pushes
freshly-graded queries to the back of the registry).

    python tools/regen_graded.py
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "dbt_spark_models_spark", "operators", "_graded.py")


def compute_graded() -> set[str]:
    """GREEN rows only: a failed or errored row must stay at the registry
    FRONT so the driver re-grades it next round (r4 lesson: unioning all
    keys buried the 11 red DeltaLite rows and agg_approx_distinct).
    Later rounds win: a query red in r4 but green in r5 counts as graded.

    Exposed as a function so tests/test_graded_sync.py can assert the
    committed _graded.py matches the CORRECTNESS_r*.json files present
    (r5+r6 verdicts: the file went stale two rounds running and the
    driver re-graded known-green rows)."""
    latest: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            latest.update(json.load(f))
    return {
        name
        for name, row in latest.items()
        if isinstance(row, dict)
        and row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and not row.get("err")
    }


def main() -> None:
    graded = compute_graded()
    doc = (
        '"""Driver-graded query names (green rows in CORRECTNESS_r*.json).\n'
        "\n"
        "Used by ``load_all`` to rotate the registry: a driver with a fixed\n"
        "per-round grading budget grades from the front of the registry, so\n"
        "queries that already have a hard driver signal are pushed to the back\n"
        "and never-graded queries come first.  Regenerate each round with\n"
        "``python tools/regen_graded.py``.\n"
        '"""\n\n'
        "DRIVER_GRADED: frozenset = frozenset({\n"
    )
    for n in sorted(graded):
        doc += f'    "{n}",\n'
    doc += "})\n"
    with open(OUT, "w") as f:
        f.write(doc)
    print(f"wrote {OUT}: {len(graded)} graded names")


if __name__ == "__main__":
    main()
