"""Serving latency vs batch size at the reference operating point
(N=100k d=128 M=16 efC=200, ef=200 k=10; index_builder/build.cpp:111-115).

The reference serves one query per HTTP POST (hnsw_service/main.cpp:59-84);
the TPU path amortizes one lockstep traversal across a whole batch, so
latency/throughput trade on batch size. This records that curve — the
number a serving deployment actually plans against — in res/latency_100k.json,
for BOTH serve modes the query service precompiles:

- speed: the headline mode (landmark-seeded entry seeds=4, serve beam
  ef=160, frontier 1.15, lockstep budget 14; res/ef_exp.json). The seed
  matmul is inside the timed region, exactly as deployed.
- quality: the exhaustive seeded ef=200 beam (no budget), the mode whose
  recall defines the headline's recall gate.

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
    from hnsw_tpu.models.hnsw import (
        HNSWIndex,
        inline_search_kwargs,
        landmark_arrays,
    )
    from hnsw_tpu.ops.topk import bruteforce_topk
    from hnsw_tpu.ops.traversal import search_batch
    from hnsw_tpu.utils.retry import device_retry

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim, m, ef_c, k, ef = 128, 16, 200, 10, 200
    seeds = 4

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

    q_all = x[rng.integers(0, n, 8192)] + 0.05 * rng.normal(
        size=(8192, dim)
    ).astype(np.float32)
    oracle = BruteforceIndex(L2Space(dim))
    oracle.add_items(x, np.arange(n))
    _, gt = oracle.search_knn(q_all[:1024], k)

    dg, vectors, sq, _, labels_np, nbr_vec = idx._sync_device()
    lm = landmark_arrays(dg, vectors, sq)
    assert lm is not None, "N too small for seeded entry"
    lv, li, lsq = lm

    modes = {
        "speed": dict(ef=160, stop_frontier=1.15, max_iters=14),
        "quality": dict(ef=ef),
    }

    out_points = {name: [] for name in modes}
    for batch in (64, 256, 1024, 8192):
        qd = jnp.asarray(q_all[:batch])
        for name, mp in modes.items():

            def run():
                # seed matmul inside the timed region: this is the deployed
                # per-request cost, not a precomputable one
                sd, si = bruteforce_topk(qd, lv, seeds, "l2", x_sq_norms=lsq)
                r = search_batch(
                    vectors, dg, qd, k=k, space="l2", sq_norms=sq,
                    **inline_search_kwargs(nbr_vec), expand=2,
                    seed_ids=jnp.take(li, si, axis=0), seed_dists=sd,
                    **mp,
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
            got = labels_np[
                np.minimum(np.asarray(ids)[:, :k], len(labels_np) - 1)
            ]
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
            out_points[name].append(row)
            print(name, row, flush=True)

    out = {
        "config": {
            "N": n, "dim": dim, "M": m, "ef_construction": ef_c, "k": k,
            "entry_seeds": seeds,
            "modes": {
                "speed": "seeds4 + ef=160 + stop_frontier=1.15 + "
                         "max_iters=14 (headline serve mode)",
                "quality": "seeds4 + ef=200 exhaustive beam",
            },
            "hardware": "TPU v5e (1 chip)",
            "note": "p50/p99 wall latency per batch incl. host dispatch and "
                    "the seed matmul; qps = batch / p50",
        },
        "points": out_points,
    }
    path = f"res/latency_{n // 1000}k.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
