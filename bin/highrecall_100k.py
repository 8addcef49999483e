"""High-recall serving modes at the reference operating point (N=100k).

The 1M exact-oracle refresh (res/highrecall_1m.json) showed the recall
frontier recipe: landmark-seeded beam + the hnswlib-style lower-bound cut
(frontier_rank=ef) + a FULL-window exact rescore (bf16 hop rows scatter
near-tie true neighbors deep into the beam order). This measures the same
recipe on the bench dataset/operating point (seed 123, 1024-cluster
gaussian — bench.py's make_dataset), against the exact oracle, reusing
bench.py's /tmp graph + GT caches. Writes res/highrecall_100k.json.

Usage: python bin/highrecall_100k.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N, DIM, M, EF_C, K, BATCH = 100_000, 128, 16, 200, 10, 8192


def main():
    import jax.numpy as jnp

    from bench import make_dataset
    from hnsw_tpu.core.spaces import L2Space
    from hnsw_tpu.models.bruteforce import BruteforceIndex
    from hnsw_tpu.models.hnsw import (
        HNSWIndex, _rescore_topk, inline_search_kwargs,
    )
    from hnsw_tpu.ops.topk import bruteforce_topk
    from hnsw_tpu.ops.traversal import search_batch
    from hnsw_tpu.utils.retry import device_retry

    rng = np.random.default_rng(123)
    x = make_dataset(N, DIM, rng)

    cache = f"/tmp/bench_graph_N{N}_d{DIM}_m{M}_efc{EF_C}_seed123.npz"
    idx = None
    if os.path.exists(cache):
        try:
            idx = HNSWIndex.load(cache)
            assert idx.num_elements == N
        except Exception:
            idx = None
    if idx is None:
        idx = HNSWIndex("l2", dim=DIM, m=M, ef_construction=EF_C)
        idx.add_items(x)

    q = x[rng.integers(0, N, BATCH)] + 0.05 * rng.normal(
        size=(BATCH, DIM)
    ).astype(np.float32)
    gt_cache = f"/tmp/bench_gt_N{N}_d{DIM}_b{BATCH}_k{K}_seed123.npz"
    gt = None
    if os.path.exists(gt_cache):
        try:
            with np.load(gt_cache) as z:
                assert np.allclose(z["q_head"], q[:4])
                gt = z["gt"]
        except Exception:
            gt = None
    if gt is None:
        oracle = BruteforceIndex(L2Space(DIM))
        oracle.add_items(x, np.arange(N))
        _, gt = oracle.search_knn(q, K)
        gt = np.asarray(gt)
        np.savez(gt_cache, gt=gt, q_head=q[:4])
    print("graph + exact GT ready", flush=True)

    dg, vectors, sq, _, labels_np, nbr_vec = idx._sync_device()
    qd = jnp.asarray(q)
    lv, li, lsq = idx._landmark_arrays(dg, vectors, sq)
    sd, si = bruteforce_topk(qd, lv, 4, "l2", x_sq_norms=lsq)
    seed_kwargs = {"seed_ids": jnp.take(li, si, axis=0), "seed_dists": sd}

    def run(ef, k_search, **stop_kwargs):
        return search_batch(
            vectors, dg, qd, k=k_search, ef=ef, space="l2", sq_norms=sq,
            **inline_search_kwargs(nbr_vec), expand=2, **stop_kwargs,
            **seed_kwargs,
        )

    rows = []

    def measure(label, ef, rescore=0, **stop_kwargs):
        m = min(rescore, ef)

        def full():
            r = run(ef, max(K, m), **stop_kwargs)
            if rescore:
                rd, ri = _rescore_topk(qd, vectors, r.ids, r.dists, k=K,
                                       m=m, space="l2", interpret=False)
                r = type(r)(rd, ri, r.hops, r.dist_comps, r.last_improve)
            return r

        def warm():
            r = full()
            r.dists.block_until_ready()
            return r

        r = device_retry(warm, attempts=5, base_sleep=15, log=print)
        t0 = time.time()
        iters = 8
        for _ in range(iters):
            r = full()
        r.dists.block_until_ready()
        qps = BATCH * iters / (time.time() - t0)
        got = labels_np[np.minimum(np.asarray(r.ids)[:, :K],
                                   len(labels_np) - 1)]
        got = np.where(np.isfinite(np.asarray(r.dists)[:, :K]), got, -1)
        rec = float(np.mean(
            [len(set(got[i]) & set(gt[i])) / K for i in range(BATCH)]
        ))
        print(f"{label:<44} recall@{K}={rec:.4f}  {qps:>8.0f} qps",
              flush=True)
        rows.append({"mode": label, "ef": ef, "rescore": rescore,
                     "recall_at_10": round(rec, 4), "qps": round(qps, 1),
                     **stop_kwargs})
        return rec

    # headline speed mode + its rescored variant
    measure("speed (seeds4 ef160 f1.15 b14)", 160,
            stop_frontier=1.15, max_iters=14)
    measure("speed + rescore48", 160, rescore=48,
            stop_frontier=1.15, max_iters=14)
    measure("speed + rescore96", 160, rescore=96,
            stop_frontier=1.15, max_iters=14)
    # high-recall: hnswlib's lower-bound cut + full-window rescore
    for ef in (320, 512):
        measure(f"seeds4 ef{ef} rank=ef f1.0 + rescore{ef}", ef,
                rescore=ef, stop_frontier=1.0, frontier_rank=ef)

    out = {
        "config": {"N": N, "dim": DIM, "M": M, "ef_construction": EF_C,
                   "k": K, "batch": BATCH, "expand": 2,
                   "dataset": "bench.py clustered-gaussian-1024c seed123",
                   "oracle": "exact (precision=highest)",
                   "hardware": "TPU v5e (1 chip)"},
        "modes": rows,
    }
    with open("res/highrecall_100k.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"modes": len(rows)}), flush=True)


if __name__ == "__main__":
    main()
