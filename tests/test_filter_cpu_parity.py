"""CPU-path filter parity (VERDICT r2 item 7): hnsw_search/search_cpu accept
an eligibility mask so filtered device queries have a CPU oracle — the
BaseFilterFunctor analog (hnswlib/hnswlib.h:128-132, hnswalg.h:1271)."""

import numpy as np

from hnsw_tpu.models.bruteforce import BruteforceIndex
from hnsw_tpu.models.hnsw import HNSWIndex

DIM = 24


def test_filtered_cpu_matches_device_and_oracle(rng):
    n = 2000
    x = rng.normal(size=(n, DIM)).astype(np.float32)
    idx = HNSWIndex("l2", dim=DIM, m=8, ef_construction=100)
    idx.add_items(x)
    q = rng.normal(size=(24, DIM)).astype(np.float32)
    mask = rng.random(n) < 0.5  # random 50% label filter

    from hnsw_tpu.core.spaces import L2Space

    bf = BruteforceIndex(L2Space(DIM))
    bf.add_items(x, np.arange(n))
    d_ref, l_ref = bf.search_knn(q, k=10, filter_labels=mask)

    d_dev, l_dev = idx.search(q, k=10, ef=300, filter_labels=mask)
    d_cpu, l_cpu, cnt = idx.search_cpu(q, k=10, ef=300, filter_labels=mask)

    assert (cnt == 10).all()
    # only allowed labels may appear
    assert mask[l_cpu.reshape(-1)].all()
    assert mask[l_dev.reshape(-1)].all()

    # both paths near-exact vs the filtered bruteforce oracle at this ef
    def recall(l_got):
        hits = sum(
            len(set(a) & set(b)) for a, b in zip(l_got, l_ref)
        )
        return hits / l_ref.size

    assert recall(l_cpu) >= 0.95
    assert recall(l_dev) >= 0.95
    # CPU and device implement the same algorithm over the same graph:
    # their result sets should agree almost everywhere
    agree = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(l_cpu, l_dev)])
    assert agree >= 0.9
