#!/usr/bin/env python
"""Sharded fast-path parity benchmark (VERDICT r2 item 1): a 1-shard
ShardedHNSWIndex on one real chip must serve at the same tier/qps as the
single-chip HNSWIndex path at N=100k, and a mutation must re-sync via a
per-shard row delta instead of a full re-stack.

The reference has no distributed serving at all (its only distribution is
per-node HTTP fetch, hnsw_service/hnsw_graph.cpp:174-212); the parity target
here is our own single-chip index. Writes res/sharded_parity.json.

Usage: python bin/sharded_parity.py [N]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from hnsw_tpu.core.spaces import L2Space
    from hnsw_tpu.models.bruteforce import BruteforceIndex
    from hnsw_tpu.models.hnsw import HNSWIndex, SearchParams
    from hnsw_tpu.parallel.sharding import ShardedHNSWIndex

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
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

    oracle = BruteforceIndex(L2Space(dim))
    oracle.add_items(x, np.arange(n))
    _, gt = oracle.search_knn(q, k)
    del oracle

    def recall(labels):
        return float(
            np.mean([len(set(labels[i]) & set(gt[i])) / k for i in range(nq)])
        )

    def qps(fn, iters=6):
        fn()  # warm/compile
        t0 = time.time()
        for _ in range(iters):
            d, l = fn()
        dt = time.time() - t0
        return nq * iters / dt, d, l

    # --- single-chip API path (HNSWIndex.search: host pre/post included) ---
    t0 = time.time()
    single = HNSWIndex("l2", dim=dim, m=m, ef_construction=ef_c)
    single.add_items(x)
    print(f"single-chip build: {time.time()-t0:.0f}s", flush=True)
    sp = SearchParams(k=k, ef=ef, expand=2)
    sq_single, _, _l = qps(lambda: single.search(q, params=sp))
    rec_single = recall(_l)
    print(f"single-chip API: {sq_single:.0f} qps recall={rec_single:.4f}",
          flush=True)

    # --- 1-shard sharded path on the same chip ---
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("shard",))
    t0 = time.time()
    sharded = ShardedHNSWIndex(
        "l2", dim, mesh=mesh, m=m, ef_construction=ef_c
    )
    sharded.build(x)
    print(f"sharded build: {time.time()-t0:.0f}s", flush=True)
    kind = sharded.arrays.kind
    sq_shard, _, _l = qps(lambda: sharded.search(q, k=k, ef=ef, expand=2))
    rec_shard = recall(_l)
    print(f"sharded ({kind} tier): {sq_shard:.0f} qps recall={rec_shard:.4f}",
          flush=True)

    # --- mutation re-syncs via row delta, not a full re-stack ---
    extra = centers[rng.integers(0, 1024, 256)] + 0.5 * rng.normal(
        size=(256, dim)
    ).astype(np.float32)
    t0 = time.time()
    sharded.add_items(extra, np.arange(n, n + 256))
    _ = sharded.search(q[:16], k=k, ef=ef)
    delta_s = time.time() - t0
    sync_mode = sharded.last_sync_mode
    print(f"add 256 + re-sync: {delta_s:.1f}s mode={sync_mode}", flush=True)
    sq_after, _, _l = qps(lambda: sharded.search(q, k=k, ef=ef, expand=2))
    rec_after = recall(_l)

    out = {
        "config": {
            "N": n, "dim": dim, "M": m, "ef_construction": ef_c, "k": k,
            "ef": ef, "batch": nq, "expand": 2, "shards": 1,
            "dataset": "clustered-gaussian-1024c",
            "hardware": "TPU v5e (1 chip)",
        },
        "single_chip_api": {"qps": round(sq_single, 1),
                            "recall_at_10": round(rec_single, 4)},
        "sharded_1shard": {"qps": round(sq_shard, 1),
                           "recall_at_10": round(rec_shard, 4),
                           "tier": kind},
        "mutation": {"added": 256, "sync_mode": sync_mode,
                     "resync_s": round(delta_s, 1),
                     "qps_after": round(sq_after, 1),
                     "recall_after": round(rec_after, 4)},
        "gate": {
            "tier_is_unified": kind == "unified",
            "qps_within_20pct_of_single": sq_shard >= 0.8 * sq_single,
            "mutation_is_delta": sync_mode == "delta",
        },
    }
    os.makedirs("res", exist_ok=True)
    with open("res/sharded_parity.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["gate"]), flush=True)


if __name__ == "__main__":
    main()
