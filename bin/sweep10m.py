"""Deep10M-class sharded validation (BASELINE.md north-star config 4):
N=10M d=96 L2, sharded over an 8-chip v5e slice, all-gather top-k merge.

Only ONE physical chip is reachable here, so the slice is simulated
shard-serially: each of the 8 sub-indices (1.25M points, int8 unified
tier) is built and queried on the real chip with identical shapes and the
SAME query batch, and the per-shard top-k results are merged with exactly
the math `parallel/sharding.py` runs after its `all_gather` (concatenate
per-shard (dist, label) lists, one global sort, take k). On a real slice
all 8 shards run concurrently under one pjit, so

  system qps  = min over shards of per-shard qps  (lockstep batch),
  merged recall = what the slice would serve.

The all-gather payload is [8, nq, k] f32+i64 (~2MB at nq=2048) — ICI noise
next to the per-shard search. Rescored distances are exact f32, so the
cross-shard merge compares exact values (shard-local rescore, the same
invariant `parallel/sharding.py` keeps for its quantized tiers).

Every expensive phase is resumable: the dataset is regenerated
deterministically, the 10M ground truth is cached to disk, each shard
build checkpoints through `bulk_build(checkpoint=)`, and each finished
shard's measurements + top-k lists are persisted — a relay-poisoned
process restarts and skips everything already done (run under
bin/sweep10m_drive.sh).

Reference analog: the storage/compute split (hnsw_graph.cpp:174-212) is
the reference's only story for serving more than fits one memory; this is
the TPU-native one (SURVEY.md §5 "distributed communication backend").

Usage: python bin/sweep10m.py [N_total] [n_shards] [out.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STATE_DIR = os.environ.get("SWEEP10M_STATE", "/tmp/sweep10m_state")


def main():
    import jax.numpy as jnp

    from hnsw_tpu.core.spaces import L2Space
    from hnsw_tpu.models.bruteforce import BruteforceIndex
    from hnsw_tpu.models.bulk_build import bulk_build
    from hnsw_tpu.models.hnsw import (
        _rescore_topk,
        inline_search_kwargs,
        landmark_arrays,
    )
    from hnsw_tpu.ops.topk import bruteforce_topk
    from hnsw_tpu.ops.traversal import search_batch
    from hnsw_tpu.utils.retry import device_retry

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out_path = sys.argv[3] if len(sys.argv) > 3 else "res/sweep_10m_sharded.json"
    dim, m, ef_c, k, ef = 96, 16, 200, 10, 200
    nq = 2048
    assert n % n_shards == 0
    n_s = n // n_shards
    os.makedirs(STATE_DIR, exist_ok=True)

    # Deterministic Deep10M-like data: clustered gaussian (deep descriptors
    # are strongly clustered; the 4096-center family matches the 1M/2M/3M
    # sweeps). Chunked generation keeps the peak at ~1x data size.
    rng = np.random.default_rng(11)
    print(f"dataset: N={n} d={dim} shards={n_shards} (clustered gaussian)",
          flush=True)
    t0 = time.time()
    centers = rng.normal(size=(4096, dim)).astype(np.float32)
    x = np.empty((n, dim), dtype=np.float32)
    for a in range(0, n, 1_000_000):
        b = min(a + 1_000_000, n)
        x[a:b] = centers[rng.integers(0, 4096, b - a)]
        x[a:b] += 0.5 * rng.normal(size=(b - a, dim)).astype(np.float32)
    q = x[rng.integers(0, n, nq)] + 0.05 * rng.normal(size=(nq, dim)).astype(
        np.float32
    )
    print(f"datagen: {time.time()-t0:.0f}s", flush=True)

    # Global exact ground truth over all 10M (cached across restarts).
    gt_path = os.path.join(STATE_DIR, "gt.npz")
    if os.path.exists(gt_path):
        with np.load(gt_path) as z:
            gt = z["gt"]
        print("oracle GT: cached", flush=True)
    else:
        oracle = BruteforceIndex(L2Space(dim))
        oracle.add_items(x, np.arange(n))
        t0 = time.time()

        def run_gt():
            return oracle.search_knn(q, k)

        _, gt = device_retry(run_gt, attempts=5, base_sleep=15, log=print)
        print(f"oracle GT: {time.time()-t0:.0f}s", flush=True)
        np.savez_compressed(gt_path, gt=gt)
        del oracle

    qd = jnp.asarray(q)
    shard_results = []
    seed_results = []
    for s in range(n_shards):
        res_path = os.path.join(STATE_DIR, f"shard{s}.json")
        topk_path = os.path.join(STATE_DIR, f"shard{s}_topk.npz")
        seed_path = os.path.join(STATE_DIR, f"shard{s}_seed.json")
        seed_topk = os.path.join(STATE_DIR, f"shard{s}_seed_topk.npz")
        have_desc = os.path.exists(res_path) and os.path.exists(topk_path)
        have_seed = os.path.exists(seed_path) and os.path.exists(seed_topk)
        if have_desc and have_seed:
            with open(res_path) as f:
                shard_results.append(json.load(f))
            with open(seed_path) as f:
                seed_results.append(json.load(f))
            print(f"shard {s}: cached", flush=True)
            continue

        lo, hi = s * n_s, (s + 1) * n_s
        print(f"shard {s}: build [{lo}, {hi})", flush=True)
        t0 = time.time()
        idx = bulk_build(
            x[lo:hi], labels=np.arange(lo, hi), space="l2", m=m,
            ef_construction=ef_c, verbose=True,
            checkpoint=os.path.join(STATE_DIR, f"bulk_s{s}"),
            checkpoint_every_s=600.0, wave_size=16384,
            wave_stop_frontier=1.15,
        )
        build_s = time.time() - t0
        idx.growth_headroom = 0.0
        t0 = time.time()
        dg, vectors, sq, _, labels_np, nbr_vec = idx.rebuild_device_tables()
        kind = None if nbr_vec is None else nbr_vec[0]
        print(f"shard {s}: built {build_s:.0f}s, {kind} tables "
              f"{time.time()-t0:.0f}s", flush=True)

        lm = landmark_arrays(dg, vectors, sq)

        def seed_kwargs(seeds):
            # landmark-seeded entry (SearchParams.entry_seeds): one MXU
            # matmul over this shard's upper-level nodes; computed per run
            # so the qps loop pays for the seed matmul
            if not seeds or lm is None:
                return {}
            lv, li, lsq = lm
            sd, si = bruteforce_topk(qd, lv, seeds, "l2", x_sq_norms=lsq)
            return {"seed_ids": jnp.take(li, si, axis=0), "seed_dists": sd}

        def run_mode(rescore_m, seeds=0, **stop_kwargs):
            r = search_batch(
                vectors, dg, qd, k=max(k, rescore_m), ef=ef, space="l2",
                sq_norms=sq, **inline_search_kwargs(nbr_vec), expand=2,
                **seed_kwargs(seeds), **stop_kwargs,
            )
            if rescore_m:
                return _rescore_topk(
                    qd, vectors, r.ids, r.dists, k=k, m=rescore_m,
                    space="l2", interpret=False,
                )
            return r.dists[:, :k], r.ids[:, :k]

        def measure(label, rescore_m, seeds=0, **stop_kwargs):
            def warm():
                d, i = run_mode(rescore_m, seeds=seeds, **stop_kwargs)
                d.block_until_ready()
                return d, i

            d, ids = device_retry(warm, attempts=5, base_sleep=15, log=print)
            t0 = time.time()
            iters = 4
            for _ in range(iters):
                d, ids = run_mode(rescore_m, seeds=seeds, **stop_kwargs)
            d.block_until_ready()
            qps = nq * iters / (time.time() - t0)
            d = np.asarray(d)[:, :k]
            labs = labels_np[np.minimum(np.asarray(ids)[:, :k],
                                        len(labels_np) - 1)]
            labs = np.where(np.isfinite(d), labs, -1)
            d = np.where(np.isfinite(d), d, np.inf)
            print(f"shard {s} {label:<24} {qps:>9.0f} qps", flush=True)
            return {"mode": label, "qps": round(qps, 1)}, d, labs

        # Lockstep hop budget from the last-improvement tail (same recipe
        # as the 1M/2M/3M sweeps); shard shapes are identical so the XLA
        # compile cache pays for shards 1..7.
        def probe(seeds=0):
            r = search_batch(
                vectors, dg, qd, k=40, ef=ef, space="l2", sq_norms=sq,
                **inline_search_kwargs(nbr_vec), expand=2,
                stop_frontier=1.15, collect_metrics=True,
                **seed_kwargs(seeds),
            )
            r.dists.block_until_ready()
            return np.asarray(r.last_improve)

        if have_desc:
            with open(res_path) as f:
                shard_results.append(json.load(f))
            print(f"shard {s}: descent modes cached", flush=True)
        else:
            last = device_retry(probe, attempts=5, base_sleep=15, log=print)
            cap = max(int(np.percentile(last, 99.9)) + 2, 8)
            print(f"shard {s}: last-improve p99.9 cap = {cap}", flush=True)

            quality, qd_d, qd_l = measure(
                "rescore40 + f1.15", 40, stop_frontier=1.15
            )
            speed, sp_d, sp_l = measure(
                f"rescore40 + f1.15 + budget {cap}", 40, stop_frontier=1.15,
                max_iters=cap,
            )
            np.savez_compressed(
                topk_path, quality_d=qd_d, quality_l=qd_l, speed_d=sp_d,
                speed_l=sp_l,
            )
            rec = {
                "shard": s, "build_s": round(build_s, 1), "tables": kind,
                "quality": quality, "speed": speed, "budget": cap,
            }
            with open(res_path, "w") as f:
                json.dump(rec, f)
            shard_results.append(rec)

        # Landmark-seeded entry modes (SearchParams.entry_seeds): the seeded
        # beam's last-improve tail is far shorter, so it gets its own budget.
        slast = device_retry(
            lambda: probe(seeds=4), attempts=5, base_sleep=15, log=print
        )
        scap = max(int(np.percentile(slast, 99.9)) + 2, 8)
        print(f"shard {s}: seeded last-improve p99.9 cap = {scap}", flush=True)
        squal, sqd, sql = measure(
            "seeds4 + rescore40 + f1.15", 40, seeds=4, stop_frontier=1.15
        )
        sspeed, ssd, ssl = measure(
            f"seeds4 + rescore40 + f1.15 + budget {scap}", 40, seeds=4,
            stop_frontier=1.15, max_iters=scap,
        )
        np.savez_compressed(
            seed_topk, quality_d=sqd, quality_l=sql, speed_d=ssd,
            speed_l=ssl,
        )
        seed_rec = {"shard": s, "quality": squal, "speed": sspeed,
                    "budget": scap}
        with open(seed_path, "w") as f:
            json.dump(seed_rec, f)
        seed_results.append(seed_rec)
        # free this shard's HBM before the next build
        del dg, vectors, sq, nbr_vec, idx, lm

    # The all-gather top-k merge (parallel/sharding.py semantics): stack
    # per-shard (dist, label), one sort, take k. Rescored distances are
    # exact f32 so cross-shard comparisons are exact.
    def merged_recall(field_d, field_l, suffix="_topk"):
        ds, ls = [], []
        for s in range(n_shards):
            with np.load(
                os.path.join(STATE_DIR, f"shard{s}{suffix}.npz")
            ) as z:
                ds.append(z[field_d])
                ls.append(z[field_l])
        d = np.concatenate(ds, axis=1)  # [nq, n_shards*k]
        l = np.concatenate(ls, axis=1)
        t0 = time.time()
        order = np.argsort(d, axis=1)[:, :k]
        top = np.take_along_axis(l, order, axis=1)
        merge_ms = (time.time() - t0) * 1000
        rec = float(
            np.mean([len(set(top[i]) & set(gt[i])) / k for i in range(nq)])
        )
        return rec, merge_ms

    rec_q, merge_ms = merged_recall("quality_d", "quality_l")
    rec_s, _ = merged_recall("speed_d", "speed_l")
    sys_q = min(r["quality"]["qps"] for r in shard_results)
    sys_s = min(r["speed"]["qps"] for r in shard_results)
    print(f"merged recall@{k}: quality={rec_q:.4f} @ {sys_q:.0f} qps | "
          f"speed={rec_s:.4f} @ {sys_s:.0f} qps (host merge {merge_ms:.1f}ms "
          f"for {nq} queries)", flush=True)
    rec_sq, _ = merged_recall("quality_d", "quality_l", "_seed_topk")
    rec_ss, _ = merged_recall("speed_d", "speed_l", "_seed_topk")
    sys_sq = min(r["quality"]["qps"] for r in seed_results)
    sys_ss = min(r["speed"]["qps"] for r in seed_results)
    print(f"merged seeded recall@{k}: quality={rec_sq:.4f} @ {sys_sq:.0f} "
          f"qps | speed={rec_ss:.4f} @ {sys_ss:.0f} qps", flush=True)

    out = {
        "config": {
            "N": n, "dim": dim, "n_shards": n_shards, "shard_size": n_s,
            "M": m, "ef_construction": ef_c, "k": k, "ef": ef, "batch": nq,
            "dataset": "clustered-gaussian-4096c",
            "hardware": "TPU v5e x1, slice simulated shard-serially",
            "slice_model": "8-chip v5e, one sub-index per chip, all-gather "
                           "top-k merge over ICI (parallel/sharding.py)",
        },
        "shards": shard_results,
        "shards_seeded": seed_results,
        "merged": {
            "quality": {"recall_at_10": round(rec_q, 4),
                        "system_qps": round(sys_q, 1)},
            "speed": {"recall_at_10": round(rec_s, 4),
                      "system_qps": round(sys_s, 1)},
            "seeded_quality": {"recall_at_10": round(rec_sq, 4),
                               "system_qps": round(sys_sq, 1)},
            "seeded_speed": {"recall_at_10": round(rec_ss, 4),
                             "system_qps": round(sys_ss, 1)},
            "host_merge_ms_per_batch": round(merge_ms, 2),
            "all_gather_payload_bytes": n_shards * nq * k * 12,
        },
        "gate": {
            "merged_recall_ge_0.95": rec_q >= 0.95,
            "seeded_recall_ge_0.95": rec_sq >= 0.95,
            "total_build_s": round(sum(r["build_s"] for r in shard_results), 1),
        },
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["gate"]), flush=True)


if __name__ == "__main__":
    main()
