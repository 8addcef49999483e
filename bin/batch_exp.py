"""Batch-size scaling of the headline serve mode (max-throughput probe).

qps = B / (budget x t_iter(B) + fixed). The lockstep budget fixes the
iteration count, so throughput scales with how sub-linearly t_iter grows
in B (VPU utilization of the per-iteration fusions + descriptor issue of
the hop kernel) and how the fixed costs (seed matmul, final sort, host
dispatch) amortize. This sweeps B at the reference operating point
(N=100k d=128 M=16 efC=200 ef(serve)=160 k=10, seeds=4, frontier 1.15,
budget 14 — the bench.py headline mode) and records recall (exact GT per
batch size) + qps in res/batch_exp.json.

Usage: python bin/batch_exp.py [N] [out.json]
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
    out_path = sys.argv[2] if len(sys.argv) > 2 else "res/batch_exp.json"
    dim, m, ef_c, k = 128, 16, 200, 10
    serve_ef, seeds, frontier, budget = 160, 4, 1.15, 14
    b_max = 32768

    rng = np.random.default_rng(123)
    centers = rng.normal(size=(1024, dim)).astype(np.float32)
    x = centers[rng.integers(0, 1024, n)] + 0.5 * rng.normal(
        size=(n, dim)
    ).astype(np.float32)

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
        t0 = time.time()
        idx = HNSWIndex("l2", dim=dim, m=m, ef_construction=ef_c)
        idx.add_items(x)
        print(f"build: {time.time()-t0:.0f}s", flush=True)
        try:
            idx.save(cache)
        except Exception:
            pass

    q_all = x[rng.integers(0, n, b_max)] + 0.05 * rng.normal(
        size=(b_max, dim)
    ).astype(np.float32)
    oracle = BruteforceIndex(L2Space(dim))
    oracle.add_items(x, np.arange(n))
    t0 = time.time()
    _, gt = oracle.search_knn(q_all, k)
    print(f"oracle GT ({b_max} queries): {time.time()-t0:.0f}s", flush=True)
    del oracle

    dg, vectors, sq, _, labels_np, nbr_vec = idx._sync_device()
    lv, li, lsq = landmark_arrays(dg, vectors, sq)

    rows = []
    for batch in (4096, 8192, 16384, 32768):
        qd = jnp.asarray(q_all[:batch])

        def run():
            sd, si = bruteforce_topk(qd, lv, seeds, "l2", x_sq_norms=lsq)
            r = search_batch(
                vectors, dg, qd, k=k, ef=serve_ef, space="l2", sq_norms=sq,
                **inline_search_kwargs(nbr_vec), expand=2,
                seed_ids=jnp.take(li, si, axis=0), seed_dists=sd,
                stop_frontier=frontier, max_iters=budget,
            )
            return r.dists, r.ids

        def warm():
            d, i = run()
            d.block_until_ready()
            return d, i

        d, ids = device_retry(warm, attempts=5, base_sleep=15, log=print)
        iters = max(2, (8192 // batch) * 6)
        t0 = time.time()
        for _ in range(iters):
            d, ids = run()
        d.block_until_ready()
        qps = batch * iters / (time.time() - t0)
        got = labels_np[np.minimum(np.asarray(ids)[:, :k], len(labels_np) - 1)]
        got = np.where(np.isfinite(np.asarray(d)[:, :k]), got, -1)
        rec = float(np.mean(
            [len(set(got[i]) & set(gt[i])) / k for i in range(batch)]
        ))
        row = {"batch": batch, "recall_at_10": round(rec, 4),
               "qps": round(qps, 1),
               "ms_per_batch": round(batch / qps * 1e3, 2)}
        rows.append(row)
        print(row, flush=True)

    out = {
        "config": {"N": n, "dim": dim, "M": m, "ef_construction": ef_c,
                   "k": k, "serve_ef": serve_ef, "entry_seeds": seeds,
                   "stop_frontier": frontier, "max_iters": budget,
                   "dataset": "clustered-gaussian-1024c (bench dataset)",
                   "hardware": "TPU v5e (1 chip)"},
        "points": rows,
        "best": max(rows, key=lambda r: r["qps"]),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["best"]), flush=True)


if __name__ == "__main__":
    main()
