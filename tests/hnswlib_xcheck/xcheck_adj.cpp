// .adj interop check: loads an adjacency file with the REFERENCE'S OWN
// loader (hnsw_service/hnsw_graph.cpp:14-151, compiled from
// /root/reference at build time — never copied into the repo) and dumps
// the parsed topology so Python can verify that a repo-exported `.adj`
// parses to exactly the neighbor lists the repo intended. Test-only.
//
// Usage: xcheck_adj <graph.adj> <dump_out>
//
// NOTE: the reference loader prints per-neighbor debug lines during load
// (hnsw_graph.cpp:54-133) — callers must redirect stdout. The dump goes
// to a file, little-endian u32 stream:
//   entrypoint, max_level, n_levels
//   per level l in 0..max_level:
//     count of nodes present at l
//     per node (ascending id): id, deg, deg x neighbor ids

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <fstream>
#include <string>
#include <vector>

#include "hnsw_graph.h"

int main(int argc, char **argv) {
    if (argc != 3) {
        fprintf(stderr, "usage: %s graph.adj dump_out\n", argv[0]);
        return 2;
    }
    HNSWGraph g;
    if (!g.load_from_file(argv[1], /*optimized=*/false)) {
        fprintf(stderr, "reference loader rejected %s\n", argv[1]);
        return 3;
    }
    std::ofstream out(argv[2], std::ios::binary);
    auto w32 = [&](uint32_t v) {
        out.write(reinterpret_cast<const char *>(&v), 4);
    };
    w32(g.entrypoint);
    w32(static_cast<uint32_t>(g.max_level));
    w32(static_cast<uint32_t>(g.levels_neighbors.size()));
    for (const auto &level_map : g.levels_neighbors) {
        std::vector<uint32_t> ids;
        ids.reserve(level_map.size());
        for (const auto &kv : level_map) ids.push_back(kv.first);
        std::sort(ids.begin(), ids.end());
        w32(static_cast<uint32_t>(ids.size()));
        for (uint32_t id : ids) {
            const auto &nb = level_map.at(id);
            w32(id);
            w32(static_cast<uint32_t>(nb.size()));
            for (uint32_t v : nb) w32(v);
        }
    }
    fprintf(stderr, "dumped %zu levels\n", g.levels_neighbors.size());
    return 0;
}
