"""Measure the serve-trim mutation cost at the HBM edge (round-4 verdict
item 6): a 4M int4+--hbm_trim index drops its delta side-tables, so a
mutation cannot patch device rows in place — it goes through the
rebuild-from-host path. This records what that actually costs: time from
one add_items / one update to the first correct query.

Reuses the 32M sweep's shard-0 artifacts (identical dataset slice, seed 29;
bulk checkpoint under /tmp/sweep32m_state) so the 4M graph resumes instead
of rebuilding. Run alone on the TPU (one device process at a time).

Writes res/trim_mutation_cost.json.

Usage: python bin/trim_mutation_cost.py [N] [out.json]
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
    from hnsw_tpu.models.bulk_build import bulk_build
    from hnsw_tpu.models.hnsw import inline_search_kwargs
    from hnsw_tpu.ops.traversal import search_batch
    from hnsw_tpu.utils.retry import device_retry

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "res/trim_mutation_cost.json"
    dim, m, ef_c, k = 128, 16, 200, 10

    # bin/sweep32m.py's datagen, truncated to the first n rows (the rng
    # draws chunk-by-chunk in the same order, so x[:n] is bit-identical
    # to the sweep's shard-0 slice and the bulk checkpoint resumes)
    rng = np.random.default_rng(29)
    centers = rng.normal(size=(4096, dim)).astype(np.float32)
    x = np.empty((n, dim), dtype=np.float32)
    for a in range(0, n, 1_000_000):
        b = min(a + 1_000_000, n)
        x[a:b] = centers[rng.integers(0, 4096, b - a)]
        x[a:b] += 0.5 * rng.normal(size=(b - a, dim)).astype(np.float32)

    t0 = time.time()
    idx = bulk_build(
        x, labels=np.arange(n), space="l2", m=m, ef_construction=ef_c,
        verbose=True, checkpoint=os.path.join(STATE_DIR, "bulk_s0"),
        checkpoint_every_s=600.0, wave_size=16384, wave_stop_frontier=1.15,
    )
    print(f"graph ready (resume/build): {time.time()-t0:.0f}s", flush=True)

    # the 4M serve-trim config (res/sweep_4m.json)
    idx.growth_headroom = 0.0
    idx.space = L2Space(dim, storage_dtype=jnp.bfloat16)
    idx.keep_delta_tables = False
    idx.upper_inline = False
    t0 = time.time()
    dg, vectors, sq, _, labels_np, nbr_vec = idx.rebuild_device_tables()
    base_sync_s = time.time() - t0
    print(f"baseline table sync: {base_sync_s:.0f}s "
          f"({None if nbr_vec is None else nbr_vec[0]})", flush=True)
    # drop our references: the re-sync after each mutation releases the
    # old tables by refcount (models/hnsw.py _full_sync) — holding them
    # here would force 2x HBM residency and OOM at the 4M edge
    del dg, vectors, sq, nbr_vec

    def query_one(vec, idx_obj):
        """One seeded query for `vec` through the current tables; returns
        (labels, elapsed_s) — the 'first correct query' probe."""
        t0 = time.time()
        d, l = idx_obj.search(
            vec[None, :], k=k, ef=200, entry_seeds=4,
        )
        return np.asarray(l)[0], time.time() - t0

    # warm the query program so mutation timings are not compile-bound
    lbl, _ = device_retry(lambda: query_one(x[123], idx), attempts=5,
                          base_sleep=15, log=print)
    assert lbl[0] == 123, lbl[:3]

    # --- mutation 1: insert one NEW point --------------------------------
    new_vec = (centers[7] + 0.01 * np.random.default_rng(99).normal(
        size=dim
    )).astype(np.float32)
    t0 = time.time()
    idx.add_items(new_vec[None, :], np.asarray([n]))
    insert_host_s = time.time() - t0
    t_sync0 = time.time()
    lbl, q_s = query_one(new_vec, idx)  # triggers the re-sync internally
    insert_total_s = time.time() - t0
    assert lbl[0] == n, lbl[:3]  # the new point is its own nearest neighbor
    print(f"insert -> first correct query: {insert_total_s:.0f}s "
          f"(host insert {insert_host_s:.1f}s, sync+query "
          f"{time.time()-t_sync0:.0f}s)", flush=True)

    # --- mutation 2: update one EXISTING label ---------------------------
    upd_vec = (centers[11] + 0.01 * np.random.default_rng(98).normal(
        size=dim
    )).astype(np.float32)
    t0 = time.time()
    idx.add_items(upd_vec[None, :], np.asarray([555]))  # update path
    update_host_s = time.time() - t0
    lbl, _ = query_one(upd_vec, idx)
    update_total_s = time.time() - t0
    assert lbl[0] == 555, lbl[:3]
    print(f"update -> first correct query: {update_total_s:.0f}s "
          f"(host update {update_host_s:.1f}s)", flush=True)

    # --- comparison: the untrimmed delta path at the same N --------------
    # (keep_delta_tables=True would patch rows in place; measuring it here
    # would need a second full sync at 4M — the single-chip delta path cost
    # is already characterized at 1M/2M (res/sharded_parity.json, delta
    # mutation gates), so this artifact records the TRIM path only.)

    out = {
        "config": {
            "N": n, "dim": dim, "M": m, "ef_construction": ef_c,
            "serve_config": "int4 unified + hbm_trim (bf16 vectors, no "
                            "delta side-tables, no upper descent tables)",
            "hardware": "TPU v5e x1",
        },
        "baseline_table_sync_s": round(base_sync_s, 1),
        "insert_to_first_correct_query_s": round(insert_total_s, 1),
        "update_to_first_correct_query_s": round(update_total_s, 1),
        "host_insert_s": round(insert_host_s, 2),
        "host_update_s": round(update_host_s, 2),
        "note": "trimmed tiers rebuild device tables on mutation; with "
                "keep_delta_tables=True mutations patch rows in place "
                "(seconds) at the cost of delta side-table HBM",
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
