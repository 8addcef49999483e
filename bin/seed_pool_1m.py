"""Pooled high-recall serving mode at N=1M (seed_pool at scale).

At 100k the pooled landmarks (upper-level nodes + strided level-0 nodes)
bought recall the beam alone can't reach: pool 71.7k + seeds 8 serves
ABOVE the exhaustive beam's recall at 2.2x its qps
(`res/seed_pool_exp.json`). This measures the same recipe at the
north-star 1M scale, reusing the sweep_stop dataset + bulk-build
checkpoint (instant resume): pools {0, 64k, 128k} x seeds {4, 8},
exhaustive + budgets calibrated from each mode's own last-improvement
tail. Writes res/seed_pool_1m.json.

Usage: python bin/seed_pool_1m.py [N] [out.json]
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
    from hnsw_tpu.models.bulk_build import bulk_build
    from hnsw_tpu.models.hnsw import inline_search_kwargs, landmark_arrays
    from hnsw_tpu.ops.topk import bruteforce_topk
    from hnsw_tpu.ops.traversal import search_batch
    from hnsw_tpu.utils.retry import device_retry

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "res/seed_pool_1m.json"
    dim, m, ef_c, k, ef = 128, 16, 200, 10, 200
    nq = 4096

    # identical dataset + checkpoint to bin/sweep_stop.py: the build
    # resumes instantly from /tmp/bulk_stop_1m_ckpt when present
    rng = np.random.default_rng(7)
    print(f"dataset: N={n} d={dim} (clustered gaussian)", flush=True)
    centers = rng.normal(size=(4096, dim)).astype(np.float32)
    x = centers[rng.integers(0, 4096, n)] + 0.5 * rng.normal(
        size=(n, dim)
    ).astype(np.float32)

    ckpt = os.environ.get("SWEEP_STOP_CKPT", f"/tmp/bulk_stop_{n}_ckpt")
    t0 = time.time()
    idx = bulk_build(
        x, space="l2", m=m, ef_construction=ef_c, verbose=True,
        checkpoint=ckpt,
    )
    print(f"build: {time.time()-t0:.0f}s", flush=True)

    q = x[rng.integers(0, n, nq)] + 0.05 * rng.normal(size=(nq, dim)).astype(
        np.float32
    )
    oracle = BruteforceIndex(L2Space(dim))
    oracle.add_items(x, np.arange(n))
    t0 = time.time()
    _, gt = oracle.search_knn(q, k)
    print(f"oracle GT: {time.time()-t0:.0f}s", flush=True)
    del oracle

    idx.growth_headroom = 0.0
    t0 = time.time()
    dg, vectors, sq, _, labels_np, nbr_vec = idx.rebuild_device_tables()
    kind = None if nbr_vec is None else nbr_vec[0]
    print(f"device sync ({kind} tables): {time.time()-t0:.0f}s", flush=True)

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
        iters = 4
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

    results = [measure("baseline (exhaustive descent)",
                       None, 0, 0)]
    for pool in (0, 65536, 131072):
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
            print(f"  [{tag}] last-improve "
                  f"p99={int(np.percentile(last, 99))} "
                  f"p99.9={int(np.percentile(last, 99.9))} "
                  f"max={int(last.max())}", flush=True)
            for cap in sorted({
                max(int(np.percentile(last, pct)) + mg, 6)
                for pct, mg in ((99.9, 2), (99.0, 2))
            }, reverse=True):
                results.append(measure(
                    f"{tag} f1.15 + budget {cap}", lm, s, pool,
                    stop_frontier=1.15, max_iters=cap,
                ))

    base_rec = results[0]["recall_at_10"]
    above = [r for r in results[1:] if r["recall_at_10"] >= base_rec]
    out = {
        "config": {"N": n, "dim": dim, "M": m, "ef_construction": ef_c,
                   "k": k, "ef": ef, "batch": nq, "expand": 2,
                   "dataset": "clustered-gaussian-4096c (sweep_stop dataset)",
                   "hardware": "TPU v5e (1 chip)"},
        "modes": results,
        "best_above_baseline_recall": (
            max(above, key=lambda r: r["qps"]) if above else None
        ),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["best_above_baseline_recall"]), flush=True)


if __name__ == "__main__":
    main()
