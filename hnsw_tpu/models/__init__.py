from hnsw_tpu.models.bruteforce import BruteforceIndex
from hnsw_tpu.models.hnsw import HNSWIndex, SearchParams

__all__ = ["BruteforceIndex", "HNSWIndex", "SearchParams"]
