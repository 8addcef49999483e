from hnsw_tpu.core.graph import HNSWGraph, DeviceGraph, graph_device_arrays, check_integrity
from hnsw_tpu.core.spaces import Space, L2Space, IPSpace, CosineSpace, get_space

__all__ = [
    "HNSWGraph",
    "DeviceGraph",
    "graph_device_arrays",
    "check_integrity",
    "Space",
    "L2Space",
    "IPSpace",
    "CosineSpace",
    "get_space",
]
