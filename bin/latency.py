"""Serving latency vs batch size at the reference operating point
(N=100k d=128 M=16 efC=200, ef=200 k=10; index_builder/build.cpp:111-115).

The reference serves one query per HTTP POST (hnsw_service/main.cpp:59-84);
the TPU path amortizes one lockstep traversal across a whole batch, so
latency/throughput trade on batch size. This records that curve — the
number a serving deployment actually plans against — in res/latency_100k.json.

Usage: python bin/latency.py [N]
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
    from hnsw_tpu.ops.traversal import search_batch
    from hnsw_tpu.utils.retry import device_retry

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim, m, ef_c, k, ef = 128, 16, 200, 10, 200

    rng = np.random.default_rng(123)
    centers = rng.normal(size=(1024, dim)).astype(np.float32)
    x = centers[rng.integers(0, 1024, n)] + 0.5 * rng.normal(
        size=(n, dim)
    ).astype(np.float32)

    t0 = time.time()
    idx = HNSWIndex("l2", dim=dim, m=m, ef_construction=ef_c)
    idx.add_items(x)
    print(f"build: {time.time()-t0:.0f}s", flush=True)

    q_all = x[rng.integers(0, n, 8192)] + 0.05 * rng.normal(
        size=(8192, dim)
    ).astype(np.float32)
    oracle = BruteforceIndex(L2Space(dim))
    oracle.add_items(x, np.arange(n))
    _, gt = oracle.search_knn(q_all[:1024], k)

    dg, vectors, sq, _, labels_np, nbr_vec = idx._sync_device()

    rows = []
    for batch in (64, 256, 1024, 8192):
        qd = jnp.asarray(q_all[:batch])

        def run(stop_frontier=1.15, max_iters=20):
            r = search_batch(
                vectors, dg, qd, k=k, ef=ef, space="l2", sq_norms=sq,
                **inline_search_kwargs(nbr_vec), expand=2,
                stop_frontier=stop_frontier, max_iters=max_iters,
            )
            return r.dists, r.ids

        def warm():
            d, i = run()
            d.block_until_ready()
            return d, i

        d, ids = device_retry(warm, attempts=5, base_sleep=15, log=print)
        lat = []
        for _ in range(30):
            t0 = time.time()
            d, ids = run()
            d.block_until_ready()
            lat.append((time.time() - t0) * 1e3)
        lat = np.asarray(lat)
        got = labels_np[np.minimum(np.asarray(ids)[:, :k], len(labels_np) - 1)]
        nrec = min(batch, 1024)
        rec = float(np.mean(
            [len(set(got[i]) & set(gt[i])) / k for i in range(nrec)]
        ))
        row = {
            "batch": batch,
            "p50_ms": round(float(np.percentile(lat, 50)), 2),
            "p99_ms": round(float(np.percentile(lat, 99)), 2),
            "qps": round(batch / (np.percentile(lat, 50) / 1e3), 1),
            "recall_at_10": round(rec, 4),
        }
        rows.append(row)
        print(row, flush=True)

    out = {
        "config": {
            "N": n, "dim": dim, "M": m, "ef_construction": ef_c, "k": k,
            "ef": ef, "mode": "speed (stop_frontier=1.15, max_iters=20)",
            "hardware": "TPU v5e (1 chip)",
            "note": "p50/p99 wall latency per batch incl. host dispatch; "
                    "qps = batch / p50",
        },
        "points": rows,
    }
    path = f"res/latency_{n // 1000}k.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
