"""Seed-pool experiment (SearchParams.seed_pool).

Hypothesis: the landmark-seeded entry matmul is MXU-bound and its table
read amortizes over the query batch, so enlarging the landmark pool beyond
the upper-level set (strided level-0 nodes) is nearly free — while the
beam starts strictly closer to the answer, shifting the last-improvement
tail further left and dropping the calibrated hop budget at equal recall.

Measures raw search_batch the way bench.py does (comparable numbers), at
the reference operating point (N=100k d=128 M=16 efC=200 ef=200 k=10,
clustered data, batch 8192): pool_extra in {0, 8k, 32k, 64k} x seeds
{4, 8}, each as {exhaustive, frontier 1.15 + budget calibrated from its
OWN last-improve tail}. Writes res/seed_pool_exp.json.

Usage: python bin/seed_pool_exp.py [N] [out.json]
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
    from hnsw_tpu.models.hnsw import (
        HNSWIndex,
        inline_search_kwargs,
        landmark_arrays,
    )
    from hnsw_tpu.ops.topk import bruteforce_topk
    from hnsw_tpu.ops.traversal import search_batch
    from hnsw_tpu.utils.retry import device_retry

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "res/seed_pool_exp.json"
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

    # same graph cache as bench.py (identical seeded dataset + build config)
    cache = f"/tmp/bench_graph_N{n}_d{dim}_m{m}_efc{ef_c}_seed123.npz"
    idx = None
    if os.path.exists(cache):
        try:
            idx = HNSWIndex.load(cache)
            assert idx.num_elements == n
            print("graph cache loaded", flush=True)
        except Exception:
            idx = None
    if idx is None:
        idx = HNSWIndex("l2", dim=dim, m=m, ef_construction=ef_c)
        t0 = time.time()
        idx.add_items(x)
        print(f"host build: {time.time()-t0:.0f}s", flush=True)
        try:
            idx.save(cache)
        except Exception:
            pass
    oracle = BruteforceIndex(L2Space(dim))
    oracle.add_items(x, np.arange(n))
    _, gt = oracle.search_knn(q, k)

    dg, vectors, sq, _, labels_np, nbr_vec = idx._sync_device()
    qd = jnp.asarray(q)

    def run(lm, s, stop_frontier=0.0, max_iters=0, collect_metrics=False):
        kwargs = {}
        if s > 0:
            lv, li, lsq = lm
            sd, si = bruteforce_topk(qd, lv, s, "l2", x_sq_norms=lsq)
            kwargs = {"seed_ids": jnp.take(li, si, axis=0), "seed_dists": sd}
        return search_batch(
            vectors, dg, qd, k=k, ef=ef, space="l2", sq_norms=sq,
            **inline_search_kwargs(nbr_vec), expand=2,
            stop_frontier=stop_frontier, max_iters=max_iters,
            collect_metrics=collect_metrics, **kwargs,
        )

    def measure(label, lm, s, pool, **stop_kwargs):
        def warm():
            r = run(lm, s, **stop_kwargs)
            r.dists.block_until_ready()
            return r

        r = device_retry(warm, attempts=5, base_sleep=15, log=print)
        t0 = time.time()
        iters = 6
        for _ in range(iters):
            r = run(lm, s, **stop_kwargs)
        r.dists.block_until_ready()
        qps = nq * iters / (time.time() - t0)
        got = labels_np[np.minimum(np.asarray(r.ids)[:, :k], len(labels_np) - 1)]
        got = np.where(np.isfinite(np.asarray(r.dists)[:, :k]), got, -1)
        rec = float(
            np.mean([len(set(got[i]) & set(gt[i])) / k for i in range(nq)])
        )
        print(f"{label:<44} recall@{k}={rec:.4f}  {qps:>9.0f} qps", flush=True)
        return {"mode": label, "recall_at_10": round(rec, 4),
                "qps": round(qps, 1), "entry_seeds": s, "seed_pool": pool,
                **stop_kwargs}

    results = []
    for pool in (0, 8192, 32768, 65536):
        lm = landmark_arrays(dg, vectors, sq, pool_extra=pool)
        n_lm = int(lm[1].shape[0])
        for s in (4, 8) if pool else (4,):
            tag = f"pool {n_lm} seeds {s}"
            results.append(measure(f"{tag} exhaustive", lm, s, pool))

            def probe():
                r = run(lm, s, stop_frontier=1.15, collect_metrics=True)
                r.dists.block_until_ready()
                return np.asarray(r.last_improve)

            last = device_retry(probe, attempts=5, base_sleep=15, log=print)
            print(f"  [{tag}] last-improve p95={int(np.percentile(last, 95))} "
                  f"p99={int(np.percentile(last, 99))} "
                  f"p99.9={int(np.percentile(last, 99.9))} "
                  f"max={int(last.max())}", flush=True)
            for pct, margin in ((99.9, 2), (99.0, 2)):
                cap = max(int(np.percentile(last, pct)) + margin, 6)
                results.append(measure(
                    f"{tag} f1.15 + budget {cap}", lm, s, pool,
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
