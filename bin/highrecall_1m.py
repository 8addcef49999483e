"""Equal-RECALL comparison vs the real hnswlib at N=1M.

res/hnswlib_parity_1m.json records the one regime where the reference
engine out-recalls our fixed lockstep beam at equal ef: near-duplicate
self-queries at 1M, where hnswlib's adaptive heap reaches 0.9999 recall@10
(ef=100+) while our ef=200 beam serves 0.9846. Equal-ef is the wrong axis
for that comparison — the two searches do different amounts of work at the
same `ef` (hnswlib's candidate heap keeps expanding until the closest
candidate is farther than the worst result, hnswalg.h:342-436; our beam
expands at most ef entries). This driver finds OUR operating points at
hnswlib's own recall levels, on the bit-identical dataset + query stream
(seed 7, nq=1024 — regenerated exactly as bin/hnswlib_xcheck_1m.py does):

1. CPU probe: our native adaptive-heap engine on OUR bulk-built graph at
   the same ef ladder — attributes the equal-ef gap between graph quality
   (bulk waves vs serial inserts) and beam-vs-heap semantics.
2. TPU ladder: landmark-seeded beams at widening ef (320/512/768) with the
   frontier stop, each also run at a hop budget calibrated from its own
   last-improvement tail — recall@10 + qps per mode.

Writes res/highrecall_1m.json with the hnswlib ladder embedded for the
side-by-side. Everything expensive (graph checkpoint, GT) is /tmp-cached
n-suffixed.

Usage: python bin/highrecall_1m.py [N] [out.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DIM, M, EF_C, K = 128, 16, 200, 10
NQ = 1024  # identical to bin/hnswlib_xcheck_1m.py: same rng draw order
QPS_TILE = 4  # qps measured on the 4x-tiled batch (4096 — the sweep batch)


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
    out_path = sys.argv[2] if len(sys.argv) > 2 else "res/highrecall_1m.json"

    # bit-identical regeneration of the parity driver's dataset + queries
    # (bin/hnswlib_xcheck_1m.py:52-60: seed 7, 4096 centers, spread 0.5,
    # then q drawn from the SAME stream — nq must stay 1024)
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4096, DIM)).astype(np.float32)
    x = centers[rng.integers(0, 4096, n)] + 0.5 * rng.normal(
        size=(n, DIM)
    ).astype(np.float32)
    q = x[rng.integers(0, n, NQ)] + 0.05 * rng.normal(
        size=(NQ, DIM)
    ).astype(np.float32)
    print(f"dataset: N={n} d={DIM} nq={NQ} (xcheck-1m stream)", flush=True)

    ckpt = os.environ.get("SWEEP_STOP_CKPT", f"/tmp/bulk_stop_{n}_ckpt")
    t0 = time.time()
    idx = bulk_build(
        x, space="l2", m=M, ef_construction=EF_C, verbose=True,
        checkpoint=ckpt,
    )
    build_s = time.time() - t0
    print(f"build: {build_s:.0f}s", flush=True)

    gt_cache = f"/tmp/hr_gt_{n}_nq{NQ}_k{K}.npz"
    gt = None
    if os.path.exists(gt_cache):
        try:
            with np.load(gt_cache) as z:
                assert np.allclose(z["q_head"], q[:4])
                gt = z["gt"]
            print("oracle GT: cached", flush=True)
        except Exception:
            gt = None
    if gt is None:
        oracle = BruteforceIndex(L2Space(DIM))
        oracle.add_items(x, np.arange(n))
        t0 = time.time()
        _, gt = oracle.search_knn(q, K)
        gt = np.asarray(gt)
        print(f"oracle GT: {time.time()-t0:.0f}s", flush=True)
        del oracle
        np.savez(gt_cache, gt=gt, q_head=q[:4])

    def recall_of(ids_np, dists_np=None):
        got = np.asarray(ids_np)[:, :K]
        if dists_np is not None:
            got = np.where(np.isfinite(np.asarray(dists_np)[:, :K]), got, -1)
        return float(np.mean(
            [len(set(got[i]) & set(gt[i])) / K for i in range(NQ)]
        ))

    # 1) CPU adaptive-heap engine on OUR graph: same search semantics as
    # hnswlib (heap beam, lower-bound cut), so any recall shortfall vs the
    # parity ladder is the bulk-built GRAPH, not the engine.
    cpu_rows = []
    for ef in (200, 500):
        t0 = time.time()
        _, labs, _ = idx.search_cpu(q, k=K, ef=ef)
        dt = time.time() - t0
        rec = recall_of(labs)
        cpu_rows.append({"ef": ef, "recall_at_10": round(rec, 4),
                         "qps": round(NQ / dt, 1)})
        print(f"CPU ours ef={ef}: recall={rec:.4f} {NQ/dt:.0f} qps",
              flush=True)

    idx.growth_headroom = 0.0
    t0 = time.time()
    dg, vectors, sq, _, labels_np, nbr_vec = idx.rebuild_device_tables()
    print(f"device sync: {time.time()-t0:.0f}s", flush=True)

    q_tiled = np.tile(q, (QPS_TILE, 1))
    qd = jnp.asarray(q_tiled)
    lm = landmark_arrays(dg, vectors, sq)
    lv, li, lsq = lm
    seeds = 4
    sd, si = bruteforce_topk(qd, lv, seeds, "l2", x_sq_norms=lsq)
    seed_kwargs = {"seed_ids": jnp.take(li, si, axis=0), "seed_dists": sd}

    def run(ef, k_search=K, stop_frontier=0.0, frontier_rank=0,
            max_iters=0, collect_metrics=False):
        return search_batch(
            vectors, dg, qd, k=k_search, ef=ef, space="l2", sq_norms=sq,
            **inline_search_kwargs(nbr_vec), expand=2,
            stop_frontier=stop_frontier, frontier_rank=frontier_rank,
            max_iters=max_iters,
            collect_metrics=collect_metrics, **seed_kwargs,
        )

    rows = []
    from hnsw_tpu.models.hnsw import _rescore_topk

    def measure(label, ef, rescore=0, **stop_kwargs):
        # rescore: exact f32 re-rank of the top `rescore` beam entries from
        # the full-precision vector table (_rescore_topk, Pallas f32) — the
        # hop kernel's bf16 unified rows misrank near-tie candidates inside
        # the beam, which is what caps the bf16 tier's device recall.
        def full(**kw):
            # the search must RETURN the rescore window (k_search=m), or the
            # re-rank only ever sees the top-K bf16-ordered ids
            m = min(rescore, ef)
            r = run(ef, k_search=max(K, m), **kw)
            if rescore:
                rd, ri = _rescore_topk(qd, vectors, r.ids, r.dists, k=K,
                                       m=m, space="l2", interpret=False)
                r = type(r)(rd, ri, r.hops, r.dist_comps, r.last_improve)
            return r

        def warm():
            r = full(**stop_kwargs)
            r.dists.block_until_ready()
            return r

        r = device_retry(warm, attempts=5, base_sleep=15, log=print)
        t0 = time.time()
        iters = 4
        for _ in range(iters):
            r = full(**stop_kwargs)
        r.dists.block_until_ready()
        qps = NQ * QPS_TILE * iters / (time.time() - t0)
        ids = np.asarray(r.ids)[:NQ]
        dists = np.asarray(r.dists)[:NQ]
        got = labels_np[np.minimum(ids[:, :K], len(labels_np) - 1)]
        rec = recall_of(got, dists)
        print(f"{label:<36} recall@{K}={rec:.4f}  {qps:>8.0f} qps",
              flush=True)
        row = {"mode": label, "ef": ef, "entry_seeds": seeds,
               "rescore": rescore,
               "recall_at_10": round(rec, 4), "qps": round(qps, 1),
               **stop_kwargs}  # stop_kwargs incl. frontier_rank when set
        rows.append(row)
        return rec

    measure("seeds4 ef200 exhaustive", 200)
    # the documented 1M speed mode (res/sweep_stop_1m.json operating point)
    measure("speed mode (seeds4 ef160 f1.15 b14)", 160,
            stop_frontier=1.15, max_iters=14)
    measure("speed mode + rescore48", 160,
            rescore=48, stop_frontier=1.15, max_iters=14)
    # the ladder runs hnswlib's OWN lower-bound cut (frontier_rank=ef: stop
    # once the best unexpanded candidate is past the ef-th best — the
    # k-pinned speed-mode cut saturates at 0.962 regardless of ef)
    for ef in (320, 512, 768):
        rec = measure(f"seeds4 ef{ef} f1.0 rank=ef", ef,
                      stop_frontier=1.0, frontier_rank=ef)

        def probe():
            r = run(ef, stop_frontier=1.0, frontier_rank=ef,
                    collect_metrics=True)
            r.dists.block_until_ready()
            return np.asarray(r.last_improve)

        last = device_retry(probe, attempts=5, base_sleep=15, log=print)
        cap = max(int(np.percentile(last, 99.9)) + 2, 6)
        print(f"  [ef{ef}] last-improve p99={int(np.percentile(last, 99))} "
              f"p99.9={int(np.percentile(last, 99.9))} max={int(last.max())}",
              flush=True)
        measure(f"seeds4 ef{ef} f1.0 rank=ef budget {cap}", ef,
                stop_frontier=1.0, frontier_rank=ef, max_iters=cap)
        # FULL-beam exact rescore: the bf16 hop rows scatter near-tie true
        # neighbors deep into the beam order (top-64 rescore is flat; the
        # true NNs ARE in the beam — presence 0.9998 at ef768), so the
        # re-rank must cover the whole beam to recover them.
        measure(f"seeds4 ef{ef} f1.0 rank=ef budget {cap} + rescore{ef}",
                ef, rescore=ef, stop_frontier=1.0, frontier_rank=ef,
                max_iters=cap)
        if rec >= 0.9995:  # matched hnswlib's ceiling — no wider beam needed
            break

    # hnswlib's ladder on this identical stream, for the side-by-side
    hl = None
    try:
        with open("res/hnswlib_parity_1m.json") as f:
            hl = json.load(f)["hnswlib"]["ladder"]
    except Exception:
        pass

    out = {
        "config": {"N": n, "dim": DIM, "M": M, "ef_construction": EF_C,
                   "k": K, "nq": NQ, "qps_batch": NQ * QPS_TILE,
                   "dataset": "clustered-gaussian-4096c seed7 "
                              "(identical stream to res/hnswlib_parity_1m.json)",
                   "hardware": "TPU v5e (1 chip)", "build_s": round(build_s, 1)},
        "cpu_ours_on_bulk_graph": cpu_rows,
        "tpu_modes": rows,
        "hnswlib_ladder": hl,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"modes": len(rows)}), flush=True)


if __name__ == "__main__":
    main()
