"""32M sharded capacity validation: N=32M d=128 L2 over the 8-chip v5e
slice model — one 4M int4-unified sub-index per chip, i.e. the validated
`res/sweep_4m.json` HBM-edge rung (int4 rows + the serve-trim config:
bf16 vector table for rescore/seeding, no delta side-tables, no upper
descent tables) composed through the sharded all-gather top-k merge.

Same simulation contract as bin/sweep10m.py / bin/sweep16m.py (one real
chip, shard-serial, identical shapes, same query batch):

  system qps  = min over shards of per-shard qps  (lockstep batch),
  merged recall = what the slice would serve.

Per-shard rescore runs against the bf16 vector table (the trim config's
invariant: bf16 rounds distances but preserves ranking well past int4
navigation noise; cross-shard comparability loses <1e-3 recall, measured
at 4M single-chip). Seeded modes only — at this rung every headline mode
is landmark-seeded and the upper descent tables don't exist.

Every phase is resumable (per-shard GT cache, checkpointed builds,
persisted per-shard results); run under bin/sweep32m_drive.sh.

Usage: python bin/sweep32m.py [N_total] [n_shards] [out.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STATE_DIR = os.environ.get("SWEEP32M_STATE", "/tmp/sweep32m_state")


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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out_path = sys.argv[3] if len(sys.argv) > 3 else "res/sweep_32m_sharded.json"
    dim, m, ef_c, k = 128, 16, 200, 10
    nq = 2048
    assert n % n_shards == 0
    n_s = n // n_shards
    os.makedirs(STATE_DIR, exist_ok=True)

    # Deterministic clustered gaussian (the 4096-center family of the other
    # sweeps). 32M x 128 f32 = 16.4GB host — generated chunk-wise, held once.
    rng = np.random.default_rng(29)
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

    # Exact GT per shard (cached), merged at the end — identical to a
    # global exact scan at 1/8 the device residency.
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

    seed_results = []
    wide_results = []
    for s in range(n_shards):
        seed_path = os.path.join(STATE_DIR, f"shard{s}_seed.json")
        seed_topk = os.path.join(STATE_DIR, f"shard{s}_seed_topk.npz")
        wide_path = os.path.join(STATE_DIR, f"shard{s}_wide.json")
        wide_topk = os.path.join(STATE_DIR, f"shard{s}_wide_topk.npz")
        shard_gt(s)  # compute+cache before the big tables claim HBM
        if all(os.path.exists(p) for p in
               (seed_path, seed_topk, wide_path, wide_topk)):
            with open(seed_path) as f:
                seed_results.append(json.load(f))
            with open(wide_path) as f:
                wide_results.append(json.load(f))
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
        # The 4M serve-trim config (bin/sweep2m.py at N>=3.5M /
        # res/sweep_4m.json): bf16 vector table (rescore + seed matmul),
        # drop delta side-tables and upper descent tables.
        idx.space = L2Space(dim, storage_dtype=jnp.bfloat16)
        idx.keep_delta_tables = False
        idx.upper_inline = False
        t0 = time.time()
        dg, vectors, sq, _, labels_np, nbr_vec = idx.rebuild_device_tables()
        kind = None if nbr_vec is None else nbr_vec[0]
        print(f"shard {s}: built {build_s:.0f}s, {kind} tables "
              f"{time.time()-t0:.0f}s", flush=True)

        lm = landmark_arrays(dg, vectors, sq)

        def seed_kwargs(seeds):
            if not seeds or lm is None:
                return {}
            lv, li, lsq = lm
            sd, si = bruteforce_topk(qd, lv, seeds, "l2", x_sq_norms=lsq)
            return {"seed_ids": jnp.take(li, si, axis=0), "seed_dists": sd}

        def run_mode(rescore_m, ef, seeds=4, **stop_kwargs):
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

        def measure(label, rescore_m, ef, seeds=4, **stop_kwargs):
            def warm():
                d, i = run_mode(rescore_m, ef, seeds=seeds, **stop_kwargs)
                d.block_until_ready()
                return d, i

            d, ids = device_retry(warm, attempts=5, base_sleep=15, log=print)
            t0 = time.time()
            iters = 4
            for _ in range(iters):
                d, ids = run_mode(rescore_m, ef, seeds=seeds, **stop_kwargs)
            d.block_until_ready()
            qps = nq * iters / (time.time() - t0)
            d = np.asarray(d)[:, :k]
            labs = labels_np[np.minimum(np.asarray(ids)[:, :k],
                                        len(labels_np) - 1)]
            labs = np.where(np.isfinite(d), labs, -1)
            d = np.where(np.isfinite(d), d, np.inf)
            print(f"shard {s} {label:<34} {qps:>9.0f} qps", flush=True)
            return {"mode": label, "qps": round(qps, 1)}, d, labs

        def probe(probe_k, probe_ef):
            r = search_batch(
                vectors, dg, qd, k=probe_k, ef=probe_ef, space="l2",
                sq_norms=sq, **inline_search_kwargs(nbr_vec), expand=2,
                stop_frontier=1.15, collect_metrics=True, **seed_kwargs(4),
            )
            r.dists.block_until_ready()
            return np.asarray(r.last_improve)

        # Seeded speed mode (ef=200 + rescore-40) with its own budget.
        last = device_retry(lambda: probe(40, 200), attempts=5,
                            base_sleep=15, log=print)
        scap = max(int(np.percentile(last, 99.9)) + 2, 8)
        print(f"shard {s}: seeded ef200 cap = {scap}", flush=True)
        squal, sqd, sql = measure(
            "seeds4 + rescore40 + f1.15", 40, 200, stop_frontier=1.15
        )
        sspeed, ssd, ssl = measure(
            f"seeds4 + rescore40 + f1.15 + budget {scap}", 40, 200,
            stop_frontier=1.15, max_iters=scap,
        )
        np.savez_compressed(seed_topk, quality_d=sqd, quality_l=sql,
                            speed_d=ssd, speed_l=ssl)
        seed_rec = {"shard": s, "build_s": round(build_s, 1),
                    "tables": kind, "quality": squal, "speed": sspeed,
                    "budget": scap}
        with open(seed_path, "w") as f:
            json.dump(seed_rec, f)
        seed_results.append(seed_rec)

        # Seeded wide-beam recovery mode (the int4 high-recall rung:
        # ef=320 + exact rescore-160), budget from its own seeded tail.
        wlast = device_retry(lambda: probe(160, 320), attempts=5,
                             base_sleep=15, log=print)
        wcap = max(int(np.percentile(wlast, 99.9)) + 2, 8)
        print(f"shard {s}: seeded ef320 cap = {wcap}", flush=True)
        wqual, wqd, wql = measure(
            "seeds4 ef320 + rescore160 + f1.15", 160, 320, stop_frontier=1.15
        )
        wspeed, wsd, wsl = measure(
            f"seeds4 ef320 + rescore160 + f1.15 + budget {wcap}", 160, 320,
            stop_frontier=1.15, max_iters=wcap,
        )
        np.savez_compressed(wide_topk, quality_d=wqd, quality_l=wql,
                            speed_d=wsd, speed_l=wsl)
        wide_rec = {"shard": s, "quality": wqual, "speed": wspeed,
                    "budget": wcap}
        with open(wide_path, "w") as f:
            json.dump(wide_rec, f)
        wide_results.append(wide_rec)
        del dg, vectors, sq, nbr_vec, idx, lm

    # Merged exact GT.
    gds, gls = [], []
    for s in range(n_shards):
        d, l = shard_gt(s)
        gds.append(d)
        gls.append(l)
    gd = np.concatenate(gds, axis=1)
    gl = np.concatenate(gls, axis=1)
    order = np.argsort(gd, axis=1)[:, :k]
    gt = np.take_along_axis(gl, order, axis=1)

    def merged_recall(field_d, field_l, suffix):
        ds, ls = [], []
        for s in range(n_shards):
            with np.load(
                os.path.join(STATE_DIR, f"shard{s}{suffix}.npz")
            ) as z:
                ds.append(z[field_d])
                ls.append(z[field_l])
        d = np.concatenate(ds, axis=1)
        l = np.concatenate(ls, axis=1)
        order = np.argsort(d, axis=1)[:, :k]
        top = np.take_along_axis(l, order, axis=1)
        return float(
            np.mean([len(set(top[i]) & set(gt[i])) / k for i in range(nq)])
        )

    merged = {}
    for name, res, suffix in (("seeded", seed_results, "_seed_topk"),
                              ("wide", wide_results, "_wide_topk")):
        rq = merged_recall("quality_d", "quality_l", suffix)
        rs = merged_recall("speed_d", "speed_l", suffix)
        merged[f"{name}_quality"] = {
            "recall_at_10": round(rq, 4),
            "system_qps": round(min(r["quality"]["qps"] for r in res), 1),
        }
        merged[f"{name}_speed"] = {
            "recall_at_10": round(rs, 4),
            "system_qps": round(min(r["speed"]["qps"] for r in res), 1),
        }
        print(f"merged {name}: quality {rq:.4f} @ "
              f"{merged[f'{name}_quality']['system_qps']:.0f} qps | speed "
              f"{rs:.4f} @ {merged[f'{name}_speed']['system_qps']:.0f} qps",
              flush=True)

    out = {
        "config": {
            "N": n, "dim": dim, "n_shards": n_shards, "shard_size": n_s,
            "M": m, "ef_construction": ef_c, "k": k, "batch": nq,
            "dataset": "clustered-gaussian-4096c",
            "hardware": "TPU v5e x1, slice simulated shard-serially",
            "slice_model": "8-chip v5e, one 4M int4-unified sub-index per "
                           "chip with the serve-trim config (bf16 vectors, "
                           "no delta/upper tables), shard-local rescore, "
                           "all-gather top-k merge (parallel/sharding.py)",
        },
        "shards_seeded": seed_results,
        "shards_wide": wide_results,
        "merged": merged,
        "gate": {
            "wide_recall_ge_0.97": merged["wide_quality"]["recall_at_10"]
            >= 0.97,
            "total_build_s": round(
                sum(r["build_s"] for r in seed_results), 1
            ),
        },
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["gate"]), flush=True)


if __name__ == "__main__":
    main()
