"""2M-per-chip capacity-tier validation (VERDICT r2 item 5): int8 unified
serving AND building (waves run on the unified8 table instead of the
~9s/wave XLA-gather fallback), with an exact-rescore pass buying back the
quantization recall. Writes res/sweep_2m.json.

Targets: build well under 1000s (round 2: 1675s), recall@10 >= 0.97 at
ef=200 with <10% qps cost from the rescore.

Usage: python bin/sweep2m.py [N] [out.json]
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
    from hnsw_tpu.models.hnsw import (
        _rescore_topk,
        inline_search_kwargs,
        landmark_arrays,
    )
    from hnsw_tpu.ops.topk import bruteforce_topk
    from hnsw_tpu.ops.traversal import search_batch
    from hnsw_tpu.utils.retry import device_retry

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "res/sweep_2m.json"
    dim, m, ef_c, k, ef = 128, 16, 200, 10, 200
    nq = 2048

    rng = np.random.default_rng(7)
    print(f"dataset: N={n} d={dim} (clustered gaussian)", flush=True)
    centers = rng.normal(size=(4096, dim)).astype(np.float32)
    x = centers[rng.integers(0, 4096, n)] + 0.5 * rng.normal(
        size=(n, dim)
    ).astype(np.float32)

    ckpt = os.environ.get("SWEEP2M_CKPT", f"/tmp/bulk2m_ckpt")
    t0 = time.time()
    idx = bulk_build(
        x, space="l2", m=m, ef_construction=ef_c, verbose=True,
        checkpoint=ckpt, checkpoint_every_s=600.0,
        wave_size=int(os.environ.get("SWEEP2M_WAVE", 16384)),
        wave_stop_frontier=float(os.environ.get("SWEEP2M_STOPF", 1.15)),
    )
    build_s = time.time() - t0
    print(f"build: {build_s:.0f}s", flush=True)
    # A resumed run's build_s is not a full-build time; the driver passes
    # the honest single-attempt number from the fresh run it resumed.
    override = os.environ.get("SWEEP2M_BUILD_S")
    if override and build_s < 0.5 * float(override):
        build_s = float(override)
        print(f"  (reporting fresh full-build time {build_s:.0f}s)",
              flush=True)

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
    if n >= 3_500_000:
        # N=4M serve residency: unified4 table 10.2GB + f32 vectors 2.05GB
        # + codes/scales 0.54GB + upper descent tables ~1.0GB + adjacency
        # ~0.6GB = ~14.4GB — measured to exhaust the v5e chip right after
        # sync (the next 2MB device_put RESOURCE_EXHAUSTs, deterministically,
        # 3/3 attempts). Trim to ~11.9GB: bf16 vector table (rescore + seed
        # matmul read bf16 rows; the MXU computes in bf16 anyway), drop the
        # delta side tables (serve-only run), and skip the per-level upper
        # descent tables — every headline mode is landmark-seeded and never
        # descends; the non-seeded baseline rows use the gather descent.
        idx.space = L2Space(dim, storage_dtype=jnp.bfloat16)
        idx.keep_delta_tables = False
        idx.upper_inline = False
        print("4M serve config: bf16 vectors, no delta side-tables, "
              "no upper descent tables", flush=True)
    t0 = time.time()
    dg, vectors, sq, _, labels_np, nbr_vec = idx.rebuild_device_tables()
    kind = None if nbr_vec is None else nbr_vec[0]
    print(f"device sync ({kind} tables): {time.time()-t0:.0f}s", flush=True)

    qd = jnp.asarray(q)

    # Landmark arrays for the seeded-entry modes (SearchParams.entry_seeds):
    # one per pool size, built once — the per-batch seed matmul itself runs
    # INSIDE the measured loop so seeded qps numbers are honest.
    _lm_cache = {}

    def lm_for(pool):
        if pool not in _lm_cache:
            _lm_cache[pool] = landmark_arrays(dg, vectors, sq,
                                              pool_extra=pool)
        return _lm_cache[pool]

    def seed_kwargs_for(queries, entry_seeds, seed_pool):
        if not entry_seeds:
            return {}
        lm = lm_for(seed_pool)
        if lm is None:
            return {}
        lv, li, lsq = lm
        s = min(entry_seeds, int(li.shape[0]))
        sd, si = bruteforce_topk(queries, lv, s, "l2", x_sq_norms=lsq)
        return {"seed_ids": jnp.take(li, si, axis=0), "seed_dists": sd}

    def measure(label, rescore_m=0, ef=ef, entry_seeds=0, seed_pool=0,
                **stop_kwargs):
        def run():
            r = search_batch(
                vectors, dg, qd, k=max(k, rescore_m), ef=ef, space="l2",
                sq_norms=sq, **inline_search_kwargs(nbr_vec), expand=2,
                **seed_kwargs_for(qd, entry_seeds, seed_pool),
                **stop_kwargs,
            )
            if rescore_m:
                rd, ri = _rescore_topk(
                    qd, vectors, r.ids, r.dists, k=k, m=rescore_m,
                    space="l2", interpret=False,
                )
                return rd, ri
            return r.dists, r.ids

        def warm():
            d, i = run()
            d.block_until_ready()
            return d, i

        d, ids = device_retry(warm, attempts=5, base_sleep=15, log=print)
        t0 = time.time()
        iters = 4
        for _ in range(iters):
            d, ids = run()
        d.block_until_ready()
        dt = (time.time() - t0) / iters
        got = labels_np[np.minimum(np.asarray(ids)[:, :k], len(labels_np) - 1)]
        got = np.where(np.isfinite(np.asarray(d)[:, :k]), got, -1)
        rec = float(
            np.mean([len(set(got[i]) & set(gt[i])) / k for i in range(nq)])
        )
        qps = nq / dt
        print(f"{label:<26} recall@{k}={rec:.4f}  {qps:>9.0f} qps", flush=True)
        rec_d = {"mode": label, "recall_at_10": round(rec, 4),
                 "qps": round(qps, 1), "rescore_m": rescore_m, "ef": ef,
                 **stop_kwargs}
        if entry_seeds:
            rec_d["entry_seeds"] = entry_seeds
            if seed_pool:
                rec_d["seed_pool"] = seed_pool
        return rec_d

    results = [
        measure("quantized raw"),
        measure("quantized + rescore 40", rescore_m=40),
        measure("quantized + rescore 100", rescore_m=100),
        measure("quantized + rescore40 + f1.15", rescore_m=40,
                stop_frontier=1.15),
    ]
    base = results[0]
    rs = results[1]

    # Wide-beam recovery mode: int4 navigation misses are candidates the
    # beam never HELD (full-beam rescore measured flat at ef=200: 0.9570 ->
    # 0.9571 at 3M), so the lever is a wider beam, not a deeper re-rank.
    # ef=320 measured 0.979 at 3M; ef=400 plateaus at the same recall.
    cap_mode = rs
    if rs["recall_at_10"] < 0.97:
        wide = measure("ef320 + rescore 160", rescore_m=160, ef=320)
        results.append(wide)
        wide_f = measure("ef320 + rescore160 + f1.15", rescore_m=160,
                         ef=320, stop_frontier=1.15)
        results.append(wide_f)
        cap_mode = max((wide, wide_f), key=lambda r: r["recall_at_10"])

    # Lockstep hop budget: the batch runs at the slowest query's pace, so a
    # hard max_iters cap removes the straggler tail at ~zero recall cost
    # (the 100k/1M sweeps measured 2.9-3.2x; frontier alone bought ~nothing
    # here). Probe once and sweep caps from the tail of the LAST-IMPROVEMENT
    # distribution (what calibrate_speed_mode uses): iterations past a
    # query's last top-k improvement are provably wasted lockstep time.
    def probe(probe_k=k, probe_ef=ef, entry_seeds=0, seed_pool=0):
        r = search_batch(
            vectors, dg, qd, k=probe_k, ef=probe_ef, space="l2", sq_norms=sq,
            **inline_search_kwargs(nbr_vec), expand=2, stop_frontier=1.15,
            **seed_kwargs_for(qd, entry_seeds, seed_pool),
            collect_metrics=True,
        )
        r.dists.block_until_ready()
        return np.asarray(r.hops), np.asarray(r.last_improve)

    def tail_caps(tag, probe_k=k, probe_ef=ef, entry_seeds=0, seed_pool=0):
        hops, last = device_retry(
            lambda: probe(probe_k, probe_ef, entry_seeds, seed_pool),
            attempts=5, base_sleep=15,
            log=print,
        )
        print(
            f"[{tag}] frontier-1.15 hops: p99={int(np.percentile(hops, 99))} "
            f"max={int(hops.max())}; last-improve: "
            f"p95={int(np.percentile(last, 95))} "
            f"p99={int(np.percentile(last, 99))} "
            f"p99.9={int(np.percentile(last, 99.9))} max={int(last.max())}",
            flush=True,
        )
        return {
            int(np.percentile(hops, 99)),
            int(np.percentile(last, 99.9)) + 2,
            int(np.percentile(last, 99)) + 2,
            int(np.percentile(last, 95)) + 2,
        }

    caps = tail_caps("ef200")
    budget_modes = [
        measure(f"rescore40 + f1.15 + budget {cap}", rescore_m=40,
                stop_frontier=1.15, max_iters=cap)
        for cap in sorted((max(c, 8) for c in caps), reverse=True)
    ]
    results.extend(budget_modes)

    # headline capacity mode = fastest budget mode within 0.5pt recall of
    # the rescore-40 exhaustive beam
    speed = max(
        (r for r in budget_modes if r["recall_at_10"] >= rs["recall_at_10"]
         - 0.005),
        key=lambda r: r["qps"],
        default=rs,
    )

    # High-recall speed mode: calibrate a lockstep hop budget for the
    # wide-beam recovery mode too — the ef=320 straggler tail is even longer
    # than ef=200's, so the last-improve cap pays at least as much there.
    # The probe tracks improvement of the rescore window's k-th best
    # (k=rescore_m), not the final k, so capped iterations can't starve
    # the exact re-rank of candidates.
    if cap_mode is not rs:
        wcaps = tail_caps("ef320", probe_k=160, probe_ef=320)
        wide_budget_modes = [
            measure(
                f"ef320 + rescore160 + f1.15 + budget {cap}",
                rescore_m=160, ef=320, stop_frontier=1.15, max_iters=cap,
            )
            for cap in sorted((max(c, 8) for c in wcaps), reverse=True)
        ]
        results.extend(wide_budget_modes)
        wide_speed = max(
            (r for r in wide_budget_modes
             if r["recall_at_10"] >= cap_mode["recall_at_10"] - 0.005),
            key=lambda r: r["qps"],
            default=cap_mode,
        )
        if wide_speed["recall_at_10"] >= 0.97:
            cap_mode = wide_speed

    # Landmark-seeded entry (res/seed_exp.json: 1.5-2.3x at 100k/1M): one
    # MXU matmul over the upper-level landmark set replaces the greedy
    # descent and shifts the last-improvement tail left, so the viable
    # lockstep budget drops. Budgets are recalibrated from the SEEDED tail —
    # the descent-calibrated caps above would leave the win on the table.
    # The seed matmul runs inside the measured loop (honest qps).
    if lm_for(0) is not None:
        seeded_anchor = measure("seeds4 + rescore40", rescore_m=40,
                                entry_seeds=4)
        results.append(seeded_anchor)
        scaps = tail_caps("ef200 seeds4", entry_seeds=4)
        seeded_budget = [
            measure(f"seeds4 + rescore40 + f1.15 + budget {cap}",
                    rescore_m=40, stop_frontier=1.15, max_iters=cap,
                    entry_seeds=4)
            for cap in sorted({max(c, 8) for c in scaps}, reverse=True)
        ]
        results.extend(seeded_budget)
        s_speed = max(
            (r for r in seeded_budget
             if r["recall_at_10"] >= rs["recall_at_10"] - 0.005),
            key=lambda r: r["qps"], default=None,
        )
        if s_speed is not None and s_speed["qps"] > speed["qps"]:
            speed = s_speed

        # Pooled high-recall serving mode (res/seed_pool_exp.json): a larger
        # strided landmark pool starts the beam strictly closer — a recall
        # lever. The pool read amortizes over the batch, so at these N the
        # matmul cost is noise next to the traversal.
        pool = min(max(n // 8, 65536), 262144)
        pcaps = tail_caps(f"ef200 seeds8 pool{pool}", entry_seeds=8,
                          seed_pool=pool)
        pooled = [
            measure(f"seeds8 pool{pool} + rescore40 + f1.15 + budget {cap}",
                    rescore_m=40, stop_frontier=1.15, max_iters=cap,
                    entry_seeds=8, seed_pool=pool)
            for cap in sorted({max(c, 8) for c in pcaps}, reverse=True)[:2]
        ]
        results.extend(pooled)
        # fastest pooled mode that clears the high-recall bar
        bar = max(0.97, cap_mode["recall_at_10"] - 0.002)
        best_pooled = max(
            (r for r in pooled if r["recall_at_10"] >= bar),
            key=lambda r: r["qps"], default=None,
        )
        if best_pooled is not None and best_pooled["qps"] > cap_mode["qps"]:
            cap_mode = best_pooled

        # Seeded wide-beam recovery (int4 tier): recalibrate the ef=320
        # high-recall mode's budget from its own seeded tail.
        if cap_mode.get("ef") == 320 or rs["recall_at_10"] < 0.97:
            wcaps_s = tail_caps("ef320 seeds4", probe_k=160, probe_ef=320,
                                entry_seeds=4)
            wide_seeded = [
                measure(f"seeds4 ef320 + rescore160 + f1.15 + budget {cap}",
                        rescore_m=160, ef=320, stop_frontier=1.15,
                        max_iters=cap, entry_seeds=4)
                for cap in sorted({max(c, 8) for c in wcaps_s},
                                  reverse=True)[:3]
            ]
            results.extend(wide_seeded)
            ws = max(
                (r for r in wide_seeded if r["recall_at_10"] >= 0.97),
                key=lambda r: r["qps"], default=None,
            )
            # take the seeded wide mode on qps, or on recall at ~equal qps
            # (the 3M run measured +0.007 recall at -1% qps — a strictly
            # better high-recall serving point)
            if ws is not None and (
                ws["qps"] > cap_mode["qps"]
                or (ws["recall_at_10"] >= cap_mode["recall_at_10"] + 0.002
                    and ws["qps"] >= 0.9 * cap_mode["qps"])
            ):
                cap_mode = ws

    # single-core CPU baseline on the same graph
    t0 = time.time()
    idx.search_cpu(q[:256], k=k, ef=ef)
    cpu_qps = 256 / (time.time() - t0)
    print(f"CPU single-core @ef=200: {cpu_qps:.0f} qps", flush=True)

    out = {
        "config": {
            "N": n, "dim": dim, "M": m, "ef_construction": ef_c, "k": k,
            "ef": ef, "batch": nq, "expand": 2,
            "dataset": "clustered-gaussian-4096c",
            "hardware": "TPU v5e (1 chip)", "inline_tables": kind,
            "build_s": round(build_s, 1),
            "cpu_single_core_qps_ef200": round(cpu_qps, 1),
        },
        "modes": results,
        "gate": {
            # 500s per million points (the 2M target was 1000s)
            "build_under_1000s": build_s < max(1000, n / 2000),
            "rescore_recall_ge_0.97": cap_mode["recall_at_10"] >= 0.97,
            "high_recall_mode": cap_mode,
            "rescore_qps_cost_pct": round(
                100 * (1 - rs["qps"] / base["qps"]), 1
            ),
            "speed_mode_within_0.5pct_recall": speed,
            "speed_mode_speedup": round(speed["qps"] / rs["qps"], 3),
        },
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["gate"]), flush=True)


if __name__ == "__main__":
    main()
