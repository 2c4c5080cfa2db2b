"""8-vs-32-core scaling evidence at ~10x sf0.1 (r12, VERDICT r11 #5).

Runs the named headline queries against a gen_scale.py dataset in a
FRESH subprocess per core count (master local[N] set via
SPARK_GRAFT_CPUS, same env contract as bench.py), noop sink, warmup + min
of 3 timed runs with clearCache before each (the honest r11 bench
methodology).  Writes plans/r12/SCALING.json.

    python tools/gen_scale.py --out /tmp/sfscale
    python tools/scaling_probe.py --sf /tmp/sfscale [--cores 32 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "graph_pagerank_supplier_customer",
    "dedup_minhash_lsh_pairs",
    "similarity_kmeans_ivf_train",
    "similarity_pq_adc_topk",
    "train_bpe_merges",
    "gold_orders_wide",
]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["SCALE_REPO"])
from dbt_spark_models_spark.session import get_spark
from dbt_spark_models_spark.operators import load_all

sf_dir = os.environ["SCALE_SF"]
names = json.loads(os.environ["SCALE_QUERIES"])
spark = get_spark("scaling_probe")
reg = load_all()
out = {}
for name in names:
    spark.sparkContext.setJobDescription(f"scaling:{name}")
    times = []
    for i in range(4):  # run 0 = warmup
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        reg[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        if i:
            times.append(dt)
    out[name] = round(min(times), 3)
    print(f"  {name}: {out[name]}s", file=sys.stderr)
print("RESULT " + json.dumps(out))
"""


def run_cores(cores: int, sf: str, queries: list[str]) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SCALE_REPO=REPO,
        SCALE_SF=sf,
        SCALE_QUERIES=json.dumps(queries),
    )
    p = subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, capture_output=True, text=True
    )
    for ln in p.stdout.splitlines():
        if ln.startswith("RESULT "):
            return json.loads(ln[len("RESULT "):])
    raise SystemExit(f"cores={cores} failed:\n{p.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sfscale")
    ap.add_argument("--cores", type=int, nargs="+", default=[32, 8])
    ap.add_argument("--queries", nargs="+", default=QUERIES)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "plans", "r12", "SCALING.json")
    )
    args = ap.parse_args()
    results = {}
    for c in args.cores:
        print(f"cores={c}:", file=sys.stderr)
        results[str(c)] = run_cores(c, args.sf, args.queries)
    lo, hi = str(min(args.cores)), str(max(args.cores))
    ratios = {
        q: round(results[lo][q] / results[hi][q], 2)
        for q in args.queries
        if results[hi].get(q)
    }
    doc = {
        "sf_dir": args.sf,
        "methodology": "fresh subprocess per core count, noop sink, "
        "clearCache before every run, min of 3 timed after 1 warmup",
        "seconds": results,
        f"ratio_{lo}c_over_{hi}c": ratios,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(doc, indent=2))


if __name__ == "__main__":
    main()
