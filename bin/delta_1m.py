"""Live in-place updates at N=1M: serve, update 10k points, delta-refresh,
serve again — no rebuild, no full re-upload.

The reference's updatePoint (hnswalg.h:995-1072) mutates the index
in place on the host; our device twin is the row-delta path
(`_try_incremental_sync`): the native engine tracks dirty rows, and the
refresh scatters only the touched unified-table rows into HBM. This
measures the full production loop at the north-star scale — qps and
recall before/after 10k updates (1% churn), host update time, and the
delta refresh time — and asserts the sync really was a delta, not a
rebuild. Writes res/delta_1m.json.

Usage: python bin/delta_1m.py [N] [n_updates] [out.json]
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
    n_upd = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    out_path = sys.argv[3] if len(sys.argv) > 3 else "res/delta_1m.json"
    dim, m, ef_c, k, ef = 128, 16, 200, 10, 200
    nq, seeds, budget = 4096, 4, 21

    # identical dataset + checkpoint to bin/sweep_stop.py (instant resume)
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
    qd = jnp.asarray(q)

    idx.growth_headroom = 0.0

    def gt_for(data):
        oracle = BruteforceIndex(L2Space(dim))
        oracle.add_items(data, np.arange(n))
        t0 = time.time()
        _, gt = oracle.search_knn(q, k)
        print(f"oracle GT: {time.time()-t0:.0f}s", flush=True)
        del oracle
        return gt

    def measure(label, gt):
        dg, vectors, sq, _, labels_np, nbr_vec = idx._sync_device()
        lv, li, lsq = landmark_arrays(dg, vectors, sq)

        def run():
            sd, si = bruteforce_topk(qd, lv, seeds, "l2", x_sq_norms=lsq)
            return search_batch(
                vectors, dg, qd, k=k, ef=ef, space="l2", sq_norms=sq,
                **inline_search_kwargs(nbr_vec), expand=2,
                seed_ids=jnp.take(li, si, axis=0), seed_dists=sd,
                stop_frontier=1.15, max_iters=budget,
            )

        def warm():
            r = run()
            r.dists.block_until_ready()
            return r

        r = device_retry(warm, attempts=5, base_sleep=15, log=print)
        t0 = time.time()
        iters = 4
        for _ in range(iters):
            r = run()
        r.dists.block_until_ready()
        qps = nq * iters / (time.time() - t0)
        got = labels_np[np.minimum(np.asarray(r.ids)[:, :k], len(labels_np) - 1)]
        got = np.where(np.isfinite(np.asarray(r.dists)[:, :k]), got, -1)
        rec = float(
            np.mean([len(set(got[i]) & set(gt[i])) / k for i in range(nq)])
        )
        print(f"{label:<28} recall@{k}={rec:.4f}  {qps:>9.0f} qps", flush=True)
        return {"recall_at_10": round(rec, 4), "qps": round(qps, 1)}

    gt0 = gt_for(x)
    before = measure("before updates", gt0)
    kind_before = idx._device[5][0] if idx._device[5] else None

    # 1% churn: move n_upd random points to NEW cluster positions (a real
    # move, not noise) and update them in place under their labels
    upd_rng = np.random.default_rng(99)
    upd_labels = upd_rng.choice(n, size=n_upd, replace=False)
    x_new = x.copy()
    x_new[upd_labels] = (
        centers[upd_rng.integers(0, 4096, n_upd)]
        + 0.5 * upd_rng.normal(size=(n_upd, dim)).astype(np.float32)
    ).astype(np.float32)

    t0 = time.time()
    idx.add_items(x_new[upd_labels], labels=upd_labels)
    host_s = time.time() - t0
    print(f"host updatePoint x{n_upd}: {host_s:.1f}s "
          f"({n_upd/host_s:.0f} updates/s)", flush=True)

    t0 = time.time()
    idx._sync_device()
    delta_s = time.time() - t0
    sync_mode = idx._last_sync_mode
    print(f"device refresh: {delta_s:.1f}s (mode={sync_mode})", flush=True)
    assert sync_mode == "delta", sync_mode

    gt1 = gt_for(x_new)
    after = measure("after updates (delta)", gt1)

    out = {
        "config": {"N": n, "dim": dim, "M": m, "ef_construction": ef_c,
                   "k": k, "ef": ef, "batch": nq, "entry_seeds": seeds,
                   "stop_frontier": 1.15, "max_iters": budget,
                   "n_updates": n_upd,
                   "dataset": "clustered-gaussian-4096c (sweep_stop dataset)",
                   "hardware": "TPU v5e (1 chip)",
                   "inline_tables": kind_before},
        "before": before,
        "host_update_s": round(host_s, 1),
        "updates_per_s": round(n_upd / host_s, 1),
        "device_delta_refresh_s": round(delta_s, 2),
        "sync_mode": sync_mode,
        "after": after,
        "gate": {
            "delta_not_rebuild": sync_mode == "delta",
            "qps_within_5pct": after["qps"] >= 0.95 * before["qps"],
            "recall_within_0.005": (
                after["recall_at_10"] >= before["recall_at_10"] - 0.005
            ),
        },
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["gate"]), flush=True)


if __name__ == "__main__":
    main()
