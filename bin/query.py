"""Interactive query driver — working replacement for the reference's stale
bin/query.py (which targeted /generate and /load endpoints that don't exist,
SURVEY.md C14). This one drives the real services: for each size it builds
via the builder CLI, starts the query service, fires repeated /search
requests and records latency + RSS, then plots.

Usage: python bin/query.py --sizes 1000 5000 --dim 64 --repeat 20 [--opt]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

from experiment import RES_DIR, clean_data, DATA_DIR, http_json, wait_ready  # noqa: E402


def run_experiment(sizes, dim, repeat, optimized):
    py = sys.executable
    results = {}
    for n in sizes:
        clean_data()
        db = os.path.join(DATA_DIR, "store.log")
        graph = os.path.join(DATA_DIR, "index.npz")
        subprocess.run(
            [py, "-m", "hnsw_tpu.service.builder_cli", str(n), str(dim), db, graph],
            check=True, cwd=REPO,
        )
        sp = subprocess.Popen(
            [py, "-m", "hnsw_tpu.service.storage_service", db, "18081"], cwd=REPO
        )
        args = [
            py, "-m", "hnsw_tpu.service.query_service", "--port", "18080",
            "--storage", "http://127.0.0.1:18081", "--dim", str(dim),
        ]
        args += (
            ["--graph", graph + ".adj", "--optimized", "1"]
            if optimized
            else ["--graph", graph]
        )
        try:
            wait_ready("http://127.0.0.1:18081/info", sp)
            qp = subprocess.Popen(args, cwd=REPO)
            try:
                wait_ready("http://127.0.0.1:18080/info", qp)
                rng = np.random.default_rng(0)
                lat, rss = [], []
                for _ in range(repeat):
                    qv = rng.normal(size=dim).astype(np.float32)
                    t0 = time.time()
                    resp = http_json(
                        "http://127.0.0.1:18080/search",
                        {"query": qv.tolist(), "k": 10},
                    )
                    lat.append(time.time() - t0)
                    rss.append(resp["rss_kb"])
                results[n] = {
                    "avg_latency_ms": float(np.mean(lat) * 1000),
                    "p50_latency_ms": float(np.percentile(lat, 50) * 1000),
                    "avg_rss_kb": float(np.mean(rss)),
                }
                print(f"N={n}: {results[n]}", flush=True)
            finally:
                qp.terminate(); qp.wait(timeout=30)
        finally:
            sp.terminate(); sp.wait(timeout=30)
    return results


def plot_results(results, optimized):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    ns = sorted(results)
    plt.figure()
    plt.plot(ns, [results[n]["avg_rss_kb"] for n in ns], "o-")
    plt.xlabel("N"); plt.ylabel("RSS (kB)")
    mode = "optimized" if optimized else "baseline"
    plt.title(f"query-service memory vs N ({mode})")
    plt.savefig(os.path.join(RES_DIR, f"query_memory_{mode}.png"), dpi=100)
    plt.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[10000, 50000])
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--repeat", type=int, default=20)
    ap.add_argument("--opt", action="store_true")
    args = ap.parse_args()
    results = run_experiment(args.sizes, args.dim, args.repeat, args.opt)
    os.makedirs(RES_DIR, exist_ok=True)
    with open(os.path.join(RES_DIR, "query_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    plot_results(results, args.opt)


if __name__ == "__main__":
    main()
