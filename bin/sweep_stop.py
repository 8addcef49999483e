"""Adaptive-termination sweep (VERDICT r2 item 2): recall/qps tradeoff of
the stop modes (stop_frontier / stop_patience) at scale, vs the
run-to-beam-exhaustion baseline. Writes res/sweep_stop_1m.json (or
res/sweep_stop_{N}.json for other sizes).

Gate: some stop mode reaches >= 1.2x baseline qps at <= 0.005 recall cost.

Usage: python bin/sweep_stop.py [N] [out.json]
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
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"res/sweep_stop_{'1m' if n == 1_000_000 else n}.json"
    )
    dim, m, ef_c, k, ef = 128, 16, 200, 10, 200
    nq = 4096

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
    lm = landmark_arrays(dg, vectors, sq)

    def seed_kwargs(seeds):
        if not seeds or lm is None:
            return {}
        lv, li, lsq = lm
        sd, si = bruteforce_topk(qd, lv, seeds, "l2", x_sq_norms=lsq)
        return {"seed_ids": jnp.take(li, si, axis=0), "seed_dists": sd}

    def measure(label, seeds=0, ef_run=None, **stop_kwargs):
        def run():
            return search_batch(
                vectors, dg, qd, k=k, ef=ef_run or ef, space="l2",
                sq_norms=sq,
                **inline_search_kwargs(nbr_vec), expand=2,
                **seed_kwargs(seeds), **stop_kwargs,
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
        dt = (time.time() - t0) / iters
        got = labels_np[np.minimum(np.asarray(r.ids), len(labels_np) - 1)]
        got = np.where(np.isfinite(np.asarray(r.dists)), got, -1)
        rec = float(
            np.mean([len(set(got[i]) & set(gt[i])) / k for i in range(nq)])
        )
        qps = nq / dt
        print(f"{label:<26} recall@{k}={rec:.4f}  {qps:>9.0f} qps", flush=True)
        return {"mode": label, "recall_at_10": round(rec, 4), "qps": round(qps, 1),
                "entry_seeds": seeds,
                **({"ef": ef_run} if ef_run else {}),
                **{k2: v for k2, v in stop_kwargs.items()}}

    results = [measure("baseline")]
    base_rec = results[0]["recall_at_10"]
    base_qps = results[0]["qps"]
    for c in (1.1, 1.15, 1.2, 1.25, 1.35, 1.5):
        results.append(measure(f"frontier c={c}", stop_frontier=c))
    for pat in (24, 32, 48, 96):
        results.append(measure(f"patience {pat}", stop_patience=pat))
    results.append(
        measure("frontier 1.2 + patience 48", stop_frontier=1.2, stop_patience=48)
    )
    results.append(
        measure("frontier 1.2 + patience 32", stop_frontier=1.2, stop_patience=32)
    )

    # Lockstep hop budget (bench.py headline mode): the batch runs at the
    # slowest query's pace, so a hard max_iters cap removes the straggler
    # tail at ~zero recall cost. Probe the frontier-stopped search once and
    # sweep caps from the tail of the LAST-IMPROVEMENT distribution — the
    # last iteration each query's k-th best distance improved (what
    # calibrate_speed_mode uses): iterations past it are provably wasted
    # lockstep time, so its percentiles land tighter than hop percentiles
    # at the same recall.
    def probe(seeds=0):
        r = search_batch(
            vectors, dg, qd, k=k, ef=ef, space="l2", sq_norms=sq,
            **inline_search_kwargs(nbr_vec), expand=2, stop_frontier=1.15,
            collect_metrics=True, **seed_kwargs(seeds),
        )
        r.dists.block_until_ready()
        return np.asarray(r.hops), np.asarray(r.last_improve)

    hops, last = device_retry(probe, attempts=5, base_sleep=15, log=print)
    print(
        f"frontier-1.15 hops: p99={int(np.percentile(hops, 99))} "
        f"max={int(hops.max())}; last-improve: "
        f"p95={int(np.percentile(last, 95))} "
        f"p99={int(np.percentile(last, 99))} "
        f"p99.9={int(np.percentile(last, 99.9))} max={int(last.max())}",
        flush=True,
    )
    caps = {
        int(np.percentile(hops, 99)),
        int(np.percentile(last, 99.9)) + 2,
        int(np.percentile(last, 99)) + 2,
        int(np.percentile(last, 95)) + 2,
    }
    for cap in sorted((max(c, 8) for c in caps), reverse=True):
        results.append(
            measure(f"frontier 1.15 + budget {cap}", stop_frontier=1.15,
                    max_iters=cap)
        )

    # Landmark-seeded entry (SearchParams.entry_seeds): the seeded tail is
    # shorter, so calibrate its budget from its OWN last-improve probe.
    if lm is not None:
        seeds = 4
        results.append(measure("seeds4 + frontier 1.15", seeds=seeds,
                               stop_frontier=1.15))
        _, slast = device_retry(lambda: probe(seeds), attempts=5,
                                base_sleep=15, log=print)
        print(
            f"seeded last-improve: p95={int(np.percentile(slast, 95))} "
            f"p99={int(np.percentile(slast, 99))} "
            f"p99.9={int(np.percentile(slast, 99.9))} "
            f"max={int(slast.max())}", flush=True,
        )
        scaps = {
            int(np.percentile(slast, 99.9)) + 2,
            int(np.percentile(slast, 99)) + 2,
            int(np.percentile(slast, 95)) + 2,
        }
        for cap in sorted((max(c, 8) for c in scaps), reverse=True):
            results.append(
                measure(f"seeds4 + f1.15 + budget {cap}", seeds=seeds,
                        stop_frontier=1.15, max_iters=cap)
            )

        # Narrow serve beam (res/ef_exp.json at 100k: with seeded entry
        # ef=160 holds the full-beam recall while every per-iteration
        # merge/dedup/sort fusion shrinks with the beam; ef=128 regresses
        # to re-expansions). Budget reuses the seeded tail caps — the
        # last-improvement distribution is a property of the trajectory,
        # which seeding (not the beam cap) determines.
        for ef_n in (160, 128):
            for cap in sorted((max(c, 8) for c in scaps), reverse=True)[1:]:
                results.append(
                    measure(f"seeds4 ef{ef_n} + f1.15 + budget {cap}",
                            seeds=seeds, ef_run=ef_n,
                            stop_frontier=1.15, max_iters=cap)
                )

    best = max(
        (r for r in results[1:] if r["recall_at_10"] >= base_rec - 0.005),
        key=lambda r: r["qps"],
        default=None,
    )
    out = {
        "config": {
            "N": n, "dim": dim, "M": m, "ef_construction": ef_c, "k": k,
            "ef": ef, "batch": nq, "expand": 2,
            "dataset": "clustered-gaussian-4096c",
            "hardware": "TPU v5e (1 chip)", "inline_tables": kind,
        },
        "baseline": results[0],
        "modes": results[1:],
        "gate": {
            "best_mode_within_0.5pct_recall": best,
            "speedup_at_<=0.5pct_recall_cost": (
                round(best["qps"] / base_qps, 3) if best else 0.0
            ),
            "pass_1.2x": bool(best and best["qps"] >= 1.2 * base_qps),
        },
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["gate"]), flush=True)


if __name__ == "__main__":
    main()
