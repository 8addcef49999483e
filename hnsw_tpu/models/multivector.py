"""Stop-condition searches: epsilon (range) search and multi-vector
document retrieval.

Reference capability surface (hnswlib/stop_condition.h):
- EpsilonSearchStopCondition (stop_condition.h:218-275): return points
  within `epsilon`, with at least `min_num_candidates` results (closest
  beyond epsilon included) and at most `max_num_candidates`.
- MultiVectorSearchStopCondition + MultiVectorL2Space/InnerProductSpace
  (stop_condition.h:18-215): every stored vector carries a document id;
  searchStopConditionClosest (hnswalg.h:1327-1378) returns the top-k
  *documents*, each scored by its closest vector.

TPU re-expression: both run the same fixed-ef batched beam (the beam width
plays the reference's max_num_candidates bound), followed by dense
post-aggregation — a mask for epsilon, a per-document min-reduce for
multi-vector — instead of pluggable heap stop-conditions.
"""

from __future__ import annotations

import numpy as np

from hnsw_tpu.core.spaces import Space, get_space
from hnsw_tpu.models.hnsw import HNSWIndex, SearchParams


def epsilon_search(
    index: HNSWIndex,
    queries: np.ndarray,
    epsilon: float,
    min_candidates: int = 1,
    max_candidates: int = 64,
    ef: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Range search → (dists [B, max_candidates], labels, valid mask).

    Semantics of EpsilonSearchStopCondition (stop_condition.h:218-275):
    every returned point is either within epsilon (squared distance for L2,
    matching the reference's raw dist space) or among the min_candidates
    closest overall; at most max_candidates per query; padding rows have
    valid=False / label=-1.
    """
    assert min_candidates <= max_candidates
    ef = max(ef, max_candidates)
    dists, labels = index.search(
        queries,
        k=max_candidates,
        ef=ef,
        params=SearchParams(k=max_candidates, ef=ef),
    )
    within = dists <= epsilon
    rank = np.arange(max_candidates)[None, :]
    valid = (within | (rank < min_candidates)) & (labels >= 0)
    labels = np.where(valid, labels, -1)
    dists = np.where(valid, dists, np.inf)
    return dists, labels, valid


class MultiVectorIndex:
    """Document retrieval over multi-vector documents.

    Each added vector belongs to a document; `search` returns the top-k
    documents scored by their closest vector (MultiVectorSearchStopCondition
    semantics, stop_condition.h:146-215). The reference smuggles the doc id
    inside the datapoint via MultiVectorL2Space/IPSpace (18-143); here the
    vector->doc mapping is a side array and aggregation is a dense reduce.
    """

    def __init__(
        self,
        space: Space | str,
        dim: int | None = None,
        m: int = 16,
        ef_construction: int = 200,
        seed: int = 123,
    ):
        if isinstance(space, str):
            space = get_space(space, dim)
        self.index = HNSWIndex(space, m=m, ef_construction=ef_construction, seed=seed)
        self._doc_of: dict[int, int] = {}  # vector label -> doc id
        self._next_label = 0

    def add_document(self, doc_id: int, vectors: np.ndarray) -> None:
        vectors = np.asarray(vectors, dtype=np.float32).reshape(-1, self.index.dim)
        labels = np.arange(self._next_label, self._next_label + len(vectors))
        self._next_label += len(vectors)
        for l in labels:
            self._doc_of[int(l)] = doc_id
        self.index.add_items(vectors, labels)

    @property
    def num_docs(self) -> int:
        return len(set(self._doc_of.values()))

    def search(
        self, queries: np.ndarray, k_docs: int = 10, ef: int = 0, oversample: int = 4
    ) -> tuple[np.ndarray, np.ndarray]:
        """→ (doc_dists [B, k_docs], doc_ids [B, k_docs]; -1 = missing).

        The beam retrieves oversample*k_docs vectors (the reference's stop
        condition similarly keeps searching until k distinct docs are
        stable); vectors collapse to documents by min-distance.
        """
        k_vec = max(k_docs * oversample, k_docs)
        ef = max(ef, k_vec)
        dists, labels = self.index.search(
            queries, k=k_vec, ef=ef, params=SearchParams(k=k_vec, ef=ef)
        )
        b = dists.shape[0]
        out_d = np.full((b, k_docs), np.inf, dtype=np.float32)
        out_doc = np.full((b, k_docs), -1, dtype=np.int64)
        for i in range(b):
            best: dict[int, float] = {}
            for dist, lab in zip(dists[i], labels[i]):
                if lab < 0 or not np.isfinite(dist):
                    continue
                doc = self._doc_of[int(lab)]
                if doc not in best or dist < best[doc]:
                    best[doc] = float(dist)
            top = sorted(best.items(), key=lambda kv: kv[1])[:k_docs]
            for j, (doc, dist) in enumerate(top):
                out_doc[i, j] = doc
                out_d[i, j] = dist
        return out_d, out_doc
