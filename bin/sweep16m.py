"""16M sharded capacity validation: N=16M d=128 L2 over the 8-chip v5e
slice model — one 2M int8-unified sub-index per chip (the validated
`res/sweep_2m.json` capacity tier), all-gather top-k merge.

Extends the Deep10M-class run (`bin/sweep10m.py`, 8x 1.25M bf16 shards at
d=96) up the tier ladder: each shard serves 2M points from int8 unified
node blocks with a shard-local EXACT rescore pass, so the all-gathered
distances are exact f32 and the cross-shard merge is exact — the same
invariant `parallel/sharding.py` keeps for its quantized tiers. On a real
slice all shards run concurrently under one pjit, so

  system qps  = min over shards of per-shard qps  (lockstep batch),
  merged recall = what the slice would serve.

Only ONE physical chip is reachable here, so the slice is simulated
shard-serially with identical shapes and the SAME query batch (the XLA
compile cache pays for shards 1..7). Ground truth is computed per shard
(exact top-k over the shard, cached) and merged — bit-identical to a
global exact scan, with 1/8 the device residency.

Every expensive phase is resumable: deterministic datagen, per-shard GT
cache, checkpointed shard builds (`bulk_build(checkpoint=)`), persisted
per-shard measurements + top-k lists. Run under a restart driver
(bin/sweep16m_drive.sh) — the HBM edge can poison the relay process.

Reference analog: the storage/compute split (hnsw_graph.cpp:174-212) is
the reference's only story for serving more than fits one memory; this is
the TPU-native one (SURVEY.md §2 "distributed communication backend").

Usage: python bin/sweep16m.py [N_total] [n_shards] [out.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STATE_DIR = os.environ.get("SWEEP16M_STATE", "/tmp/sweep16m_state")


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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out_path = sys.argv[3] if len(sys.argv) > 3 else "res/sweep_16m_sharded.json"
    dim, m, ef_c, k, ef = 128, 16, 200, 10, 200
    nq = 2048
    assert n % n_shards == 0
    n_s = n // n_shards
    os.makedirs(STATE_DIR, exist_ok=True)

    # Deterministic clustered gaussian (the 4096-center family of the
    # 1M/2M/3M/4M sweeps), generated chunk-wise to bound the peak.
    rng = np.random.default_rng(17)
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
    qd = jnp.asarray(q)

    # Exact GT per shard (cached), merged at the end: concat per-shard exact
    # top-k, one sort, take k — identical to a global scan.
    def shard_gt(s):
        gt_path = os.path.join(STATE_DIR, f"gt_shard{s}.npz")
        if os.path.exists(gt_path):
            with np.load(gt_path) as z:
                return z["d"], z["l"]
        lo, hi = s * n_s, (s + 1) * n_s
        oracle = BruteforceIndex(L2Space(dim))
        oracle.add_items(x[lo:hi], np.arange(lo, hi))
        t0 = time.time()
        d, l = device_retry(
            lambda: oracle.search_knn(q, k), attempts=5, base_sleep=15,
            log=print,
        )
        print(f"shard {s}: oracle GT {time.time()-t0:.0f}s", flush=True)
        np.savez_compressed(gt_path, d=d, l=l)
        return d, l

    shard_results = []
    seed_results = []
    for s in range(n_shards):
        res_path = os.path.join(STATE_DIR, f"shard{s}.json")
        topk_path = os.path.join(STATE_DIR, f"shard{s}_topk.npz")
        seed_path = os.path.join(STATE_DIR, f"shard{s}_seed.json")
        seed_topk = os.path.join(STATE_DIR, f"shard{s}_seed_topk.npz")
        shard_gt(s)  # compute+cache before the big tables claim HBM
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
            # matmul over this shard's upper nodes, run per measured call
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
                # shard-local exact rescore: merged distances are exact f32
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

        # Seeded modes get their own budget: the seeded tail is far shorter,
        # and on quantized tiers seeding RAISES recall (full-precision seed
        # matmul bypasses the int8 descent's quantization errors).
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

    # Merged exact GT: concat per-shard exact top-k, one sort, take k.
    gds, gls = [], []
    for s in range(n_shards):
        d, l = shard_gt(s)
        gds.append(d)
        gls.append(l)
    gd = np.concatenate(gds, axis=1)
    gl = np.concatenate(gls, axis=1)
    order = np.argsort(gd, axis=1)[:, :k]
    gt = np.take_along_axis(gl, order, axis=1)

    # The all-gather top-k merge (parallel/sharding.py semantics).
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
            "slice_model": "8-chip v5e, one 2M int8-unified sub-index per "
                           "chip, shard-local exact rescore, all-gather "
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
            "merged_recall_ge_0.97": rec_q >= 0.97,
            "seeded_recall_ge_0.97": rec_sq >= 0.97,
            "total_build_s": round(sum(r["build_s"] for r in shard_results), 1),
        },
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["gate"]), flush=True)


if __name__ == "__main__":
    main()
