from hnsw_tpu.ops.distance import (
    pairwise_l2_sq,
    pairwise_ip_dist,
    pairwise_dist,
    gather_l2_sq,
    gather_ip_dist,
    gather_dist,
)
from hnsw_tpu.ops.topk import topk_smallest, merge_sorted_topk, bruteforce_topk

__all__ = [
    "pairwise_l2_sq",
    "pairwise_ip_dist",
    "pairwise_dist",
    "gather_l2_sq",
    "gather_ip_dist",
    "gather_dist",
    "topk_smallest",
    "merge_sorted_topk",
    "bruteforce_topk",
]
