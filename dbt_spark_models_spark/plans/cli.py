"""CLI: the in-process equivalent of the reference's dbt invocations
(``run_production.sh:36``, ``snapshot_production.sh:68``, ``test.sh:13``).

    python -m dbt_spark_models_spark.plans.cli run --project examples/mini_mart \\
        --vars '{"sf_dir": "/root/testdata/sf0.001"}' --select tag:mart
    python -m dbt_spark_models_spark.plans.cli build --project ... --database mart
    python -m dbt_spark_models_spark.plans.cli compile --project ...  # render only
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="spark-models-engine")
    ap.add_argument(
        "command",
        choices=[
            "run", "seed", "snapshot", "test", "build", "compile", "lint", "docs",
            "jobs-graph",
        ],
    )
    ap.add_argument("--target-dir", default=None)
    ap.add_argument(
        "--schedule", default=None,
        help="dags_schedule-style YAML/JSON for jobs-graph (default: one DAG)",
    )
    ap.add_argument("--project", required=True)
    ap.add_argument("--database", default=None)
    ap.add_argument("--select", nargs="*", default=None)
    ap.add_argument("--exclude", nargs="*", default=None)
    ap.add_argument("--vars", default="{}", help="JSON dict")
    ap.add_argument("--full-refresh", action="store_true")
    ap.add_argument(
        "--threads", type=int, default=None,
        help="dbt-style DAG parallelism: N>=2 runs independent models "
        "concurrently (ready-set scheduler; default serial)",
    )
    ap.add_argument(
        "--pools", default="{}",
        help='JSON dict {airflow_pool: max_concurrent} honored by --threads',
    )
    ap.add_argument(
        "--changed-only", action="store_true",
        help="select models whose source file changed vs --base-ref, is "
        "modified in the working tree, or is untracked (reference "
        "infra/dbtjoom changed-file selection)",
    )
    ap.add_argument("--base-ref", default="origin/master")
    ap.add_argument(
        "--select-dependencies", choices=["fill_gaps", "all_children"],
        default=None,
        help="expand --changed-only: fill_gaps adds intermediates between "
        "changed nodes; all_children selects their descendants",
    )
    ap.add_argument(
        "--failed-only", action="store_true",
        help="restrict to nodes whose last run_results status was not "
        "success (retry pattern)",
    )
    args = ap.parse_args(argv)

    from dbt_spark_models_spark.plans import Project, Runner

    project = Project.load(args.project)

    if args.command == "docs":
        # parse + emit manifest.json, no Spark needed (dbt compile/docs gate)
        from dbt_spark_models_spark.plans import jinja
        from dbt_spark_models_spark.plans.manifest import write_manifest

        for node in list(project.models.values()) + list(
            project.snapshots.values()
        ):
            jinja.parse_node(project, node)
        print(write_manifest(project, args.target_dir))
        return 0

    if args.command == "jobs-graph":
        # deploy-time Airflow export (deploy.sh:20-22), no Spark needed
        from dbt_spark_models_spark.plans.orchestration import write_jobs_graph

        print(write_jobs_graph(project, args.schedule, args.target_dir))
        return 0

    if args.command == "lint":
        # no Spark session needed: parse + policy checks only
        from dbt_spark_models_spark.plans import jinja
        from dbt_spark_models_spark.plans.lint import lint_project

        for node in list(project.models.values()) + list(
            project.snapshots.values()
        ):
            jinja.parse_node(project, node)
        from dbt_spark_models_spark.plans.lint import lint_style

        issues = lint_project(
            project, require_owner=False, require_file_format=False
        )
        strict = lint_project(project)
        for i in strict:
            sev = "ERROR" if i in issues else "WARN"
            print(f"{sev:5} [{i.rule}] {i.node}: {i.message}")
        # style pass (the reference CI's sqlfluff step) — style issues
        # fail the lint like the reference's sqlfluff-fix workflow gate
        style = lint_style(project)
        for i in style:
            print(f"STYLE [{i.rule}] {i.node}: {i.message}")
        return 1 if (issues or style) else 0

    from dbt_spark_models_spark.session import get_spark

    spark = get_spark(f"engine:{project.name}")
    runner = Runner(
        spark=spark,
        project=project,
        database=args.database,
        vars=json.loads(args.vars),
    )

    if args.command == "compile":
        from dbt_spark_models_spark.plans import graph

        for name in graph.select_nodes(project, args.select, args.exclude):
            node = project.models[name]
            print(f"-- model: {name} {node.config}")
            print(runner._compile(node, is_incremental=False))
            print()
        return 0

    pools = json.loads(args.pools)
    names = None
    if args.changed_only or args.failed_only:
        # caller-resolved exact selection: changed/failed filters compose
        # with --select/--exclude by intersection, and the final list is
        # NOT re-gap-filled (reference find_nodes semantics)
        from dbt_spark_models_spark.plans import graph

        chosen: set[str] | None = None
        if args.changed_only:
            chosen = set(
                graph.select_changed(
                    project, args.base_ref, args.select_dependencies
                )
            )
        if args.failed_only:
            failed = {
                n
                for n in graph.failed_models(project, args.target_dir)
                if n in project.models
            }
            chosen = failed if chosen is None else chosen & failed
        if args.select or args.exclude:
            chosen &= set(graph.select_nodes(project, args.select, args.exclude))
        names = [n for n in graph.build_order(project) if n in chosen]
        if not names:
            print("changed/failed selection matched no models")
    if args.command == "run":
        results = runner.run(
            args.select, args.exclude, args.full_refresh,
            threads=args.threads, pools=pools, names=names,
        )
    elif args.command == "seed":
        results = runner.seed()
    elif args.command == "snapshot":
        results = runner.snapshot()
    elif args.command == "test":
        results = runner.test()
    else:
        results = runner.build(
            select=args.select, exclude=args.exclude,
            full_refresh=args.full_refresh,
            threads=args.threads, pools=pools, names=names,
        )

    from dbt_spark_models_spark.plans.manifest import write_run_results

    write_run_results(results, project, args.target_dir)
    worst = 0
    for r in results:
        line = f"{r.status.upper():8} {r.kind:8} {r.node} ({r.action}) {r.seconds:.2f}s"
        if r.message:
            line += f" — {r.message}"
        print(line)
        if r.status in ("error", "fail"):
            worst = 1
    return worst


if __name__ == "__main__":
    sys.exit(main())
