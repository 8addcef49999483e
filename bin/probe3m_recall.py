"""Probe: push the 3M int4 capacity tier past recall@10 0.97.

The committed sweep (res/sweep_3m.json) serves 0.9601 at ef=200 with
rescore-100; the remaining misses are candidates the int4-navigated beam
never retained. Probes two levers on the resumed 3M checkpoint:
  - full-beam rescore (m = ef): any true neighbor the beam kept is
    recovered exactly;
  - wider beams (ef 320/400): keep more candidates in the first place.

Usage: python bin/probe3m_recall.py [N] [nq]
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
    from hnsw_tpu.models.hnsw import _rescore_topk, inline_search_kwargs
    from hnsw_tpu.ops.traversal import search_batch
    from hnsw_tpu.utils.retry import device_retry

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    dim, m, ef_c, k = 128, 16, 200, 10

    rng = np.random.default_rng(7)
    print(f"dataset: N={n} d={dim} (clustered gaussian)", flush=True)
    centers = rng.normal(size=(4096, dim)).astype(np.float32)
    x = centers[rng.integers(0, 4096, n)] + 0.5 * rng.normal(
        size=(n, dim)
    ).astype(np.float32)

    ckpt = os.environ.get("SWEEP3M_CKPT", "/tmp/bulk3m_ckpt")
    t0 = time.time()
    idx = bulk_build(
        x, space="l2", m=m, ef_construction=ef_c, verbose=True,
        checkpoint=ckpt, checkpoint_every_s=600.0,
        wave_size=16384, wave_stop_frontier=1.15,
    )
    print(f"build(resume): {time.time()-t0:.0f}s", flush=True)

    # sweep2m draws nq=2048 then perturbs; draw the same count so the
    # first `nq` queries match the committed artifact's distribution
    qfull = x[rng.integers(0, n, 2048)] + 0.05 * rng.normal(
        size=(2048, dim)
    ).astype(np.float32)
    q = qfull[:nq]
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

    def measure(label, ef, rescore_m=0, **stop_kwargs):
        def run():
            r = search_batch(
                vectors, dg, qd, k=max(k, rescore_m), ef=ef, space="l2",
                sq_norms=sq, **inline_search_kwargs(nbr_vec), expand=2,
                **stop_kwargs,
            )
            if rescore_m:
                return _rescore_topk(
                    qd, vectors, r.ids, r.dists, k=k, m=rescore_m,
                    space="l2", interpret=False,
                )
            return r.dists, r.ids

        def warm():
            d, i = run()
            d.block_until_ready()
            return d, i

        d, ids = device_retry(warm, attempts=5, base_sleep=15, log=print)
        t0 = time.time()
        iters = 3
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
        print(f"{label:<34} recall@{k}={rec:.4f}  {qps:>9.0f} qps",
              flush=True)
        return {"mode": label, "ef": ef, "recall_at_10": round(rec, 4),
                "qps": round(qps, 1), "rescore_m": rescore_m, **stop_kwargs}

    results = [
        measure("ef200 + rescore 100", 200, rescore_m=100),
        measure("ef200 + rescore 200", 200, rescore_m=200),
        measure("ef320 + rescore 160", 320, rescore_m=160),
        measure("ef320 + rescore 320", 320, rescore_m=320),
        measure("ef400 + rescore 400", 400, rescore_m=400),
    ]
    with open("/tmp/probe3m_recall.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
