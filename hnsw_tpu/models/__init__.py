from hnsw_tpu.models.bruteforce import BruteforceIndex
from hnsw_tpu.models.hnsw import HNSWIndex, SearchParams
from hnsw_tpu.models.multivector import MultiVectorIndex, epsilon_search

__all__ = [
    "BruteforceIndex",
    "HNSWIndex",
    "SearchParams",
    "MultiVectorIndex",
    "epsilon_search",
]
