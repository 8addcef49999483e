"""Landmark-seeded entry experiment (SearchParams.entry_seeds).

Hypothesis: the lockstep batch time is set by the last-improvement tail of
the level-0 beam; starting the beam at the exact top-S upper-level nodes
(one MXU matmul over the graph's own 1/M landmark sample) instead of the
greedy descent's single approximate entry shortens that tail, so the
calibrated hop budget drops at equal recall.

Measures raw search_batch the way bench.py does (comparable numbers), at
the reference operating point (N=100k d=128 M=16 efC=200 ef=200 k=10,
clustered data, batch 8192): descent vs seeded S in {1, 4, 8}, each as
{exhaustive, frontier 1.15 + budget calibrated from its OWN last-improve
tail}. Writes res/seed_exp.json.

Usage: python bin/seed_exp.py [N] [out.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax.numpy as jnp

    from hnsw_tpu.core.spaces import L2Space
    from hnsw_tpu.models.bruteforce import BruteforceIndex
    from hnsw_tpu.models.hnsw import HNSWIndex, inline_search_kwargs
    from hnsw_tpu.ops.topk import bruteforce_topk
    from hnsw_tpu.ops.traversal import search_batch
    from hnsw_tpu.utils.retry import device_retry

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "res/seed_exp.json"
    dim, m, ef_c, k, ef = 128, 16, 200, 10, 200
    nq = 8192

    rng = np.random.default_rng(123)
    centers = rng.normal(size=(1024, dim)).astype(np.float32)
    x = centers[rng.integers(0, 1024, n)] + 0.5 * rng.normal(
        size=(n, dim)
    ).astype(np.float32)
    q = x[rng.integers(0, n, nq)] + 0.05 * rng.normal(size=(nq, dim)).astype(
        np.float32
    )

    idx = HNSWIndex("l2", dim=dim, m=m, ef_construction=ef_c)
    t0 = time.time()
    idx.add_items(x)
    print(f"host build: {time.time()-t0:.0f}s", flush=True)
    oracle = BruteforceIndex(L2Space(dim))
    oracle.add_items(x, np.arange(n))
    _, gt = oracle.search_knn(q, k)

    dg, vectors, sq, _, labels_np, nbr_vec = idx._sync_device()
    lv, li, lsq = idx._landmark_arrays(dg, vectors, sq)
    print(f"landmarks: {int(li.shape[0])}", flush=True)
    qd = jnp.asarray(q)

    def run(s, stop_frontier=0.0, max_iters=0, collect_metrics=False):
        kwargs = {}
        if s > 0:
            sd, si = bruteforce_topk(qd, lv, s, "l2", x_sq_norms=lsq)
            kwargs = {"seed_ids": jnp.take(li, si, axis=0), "seed_dists": sd}
        return search_batch(
            vectors, dg, qd, k=k, ef=ef, space="l2", sq_norms=sq,
            **inline_search_kwargs(nbr_vec), expand=2,
            stop_frontier=stop_frontier, max_iters=max_iters,
            collect_metrics=collect_metrics, **kwargs,
        )

    def measure(label, s, **stop_kwargs):
        def warm():
            r = run(s, **stop_kwargs)
            r.dists.block_until_ready()
            return r

        r = device_retry(warm, attempts=5, base_sleep=15, log=print)
        t0 = time.time()
        iters = 6
        for _ in range(iters):
            r = run(s, **stop_kwargs)
        r.dists.block_until_ready()
        qps = nq * iters / (time.time() - t0)
        got = labels_np[np.minimum(np.asarray(r.ids)[:, :k], len(labels_np) - 1)]
        got = np.where(np.isfinite(np.asarray(r.dists)[:, :k]), got, -1)
        rec = float(
            np.mean([len(set(got[i]) & set(gt[i])) / k for i in range(nq)])
        )
        print(f"{label:<38} recall@{k}={rec:.4f}  {qps:>9.0f} qps", flush=True)
        return {"mode": label, "recall_at_10": round(rec, 4),
                "qps": round(qps, 1), "entry_seeds": s, **stop_kwargs}

    results = []
    for s in (0, 1, 4, 8):
        tag = "descent" if s == 0 else f"seeds {s}"
        results.append(measure(f"{tag} exhaustive", s))

        def probe():
            r = run(s, stop_frontier=1.15, collect_metrics=True)
            r.dists.block_until_ready()
            return np.asarray(r.last_improve)

        last = device_retry(probe, attempts=5, base_sleep=15, log=print)
        print(f"  [{tag}] last-improve p95={int(np.percentile(last, 95))} "
              f"p99={int(np.percentile(last, 99))} "
              f"p99.9={int(np.percentile(last, 99.9))} "
              f"max={int(last.max())}", flush=True)
        for pct, margin in ((99.9, 2), (99.0, 2)):
            cap = max(int(np.percentile(last, pct)) + margin, 8)
            results.append(measure(
                f"{tag} f1.15 + budget {cap}", s,
                stop_frontier=1.15, max_iters=cap,
            ))

    base = results[0]
    best = max(
        (r for r in results
         if r["recall_at_10"] >= base["recall_at_10"] - 0.0005),
        key=lambda r: r["qps"],
    )
    out = {
        "config": {"N": n, "dim": dim, "M": m, "ef_construction": ef_c,
                   "k": k, "ef": ef, "batch": nq, "expand": 2,
                   "landmarks": int(li.shape[0]),
                   "dataset": "clustered-gaussian-1024c (bench dataset)",
                   "hardware": "TPU v5e (1 chip)"},
        "modes": results,
        "best_at_equal_recall": best,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["best_at_equal_recall"]), flush=True)


if __name__ == "__main__":
    main()
