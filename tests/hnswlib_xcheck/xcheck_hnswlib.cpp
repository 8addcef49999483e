// Cross-validation driver for the REAL vendored hnswlib engine
// (/root/reference/hnswlib/hnswalg.h — header-only, included at compile
// time via -I, never copied). Test-only: this binary lives under tests/
// and is never linked into hnsw_tpu. It converts every
// "hnswlib-equivalent" claim in the repo from self-referential to
// verified against the actual reference engine.
//
// Usage:
//   xcheck_hnswlib build_search <data.f32> <n> <dim> <M> <efC> \
//       <queries.f32> <nq> <k> <ef> <out_ids.i64> [adj_out]
//   xcheck_hnswlib build_churn_search ... same args ... \
//       <upd.f32> <upd_ids.u32> <nu>
//     (after the build, re-addPoint nu existing labels with new vectors —
//      hnswlib routes those through updatePoint/repairConnectionsForUpdate,
//      hnswalg.h:965-1150 — then search; the update-churn semantics
//      baseline for native/builder.cpp's update().)
//   xcheck_hnswlib build_filter_search ... same args ... <mask.u8>
//     (search with a BaseFilterFunctor admitting only labels whose mask
//      byte is nonzero — hnswlib.h:128-132 / hnswalg.h:311-440's
//      isIdAllowed path; the filtered-search semantics baseline for
//      hnsw_search_filtered and the device filter_labels mask.)
//   xcheck_hnswlib build_epsilon_search ... same args ... <eps> <min_c> <max_c>
//     (range search via searchStopConditionClosest +
//      EpsilonSearchStopCondition (hnswalg.h:1327-1378,
//      stop_condition.h:218-275) — the semantics baseline for
//      models/multivector.py's epsilon_search. out_ids is [nq, max_c],
//      -1 padded; distances are raw squared L2 like the reference's.)
//   xcheck_hnswlib build_search_u8 data.u8 n dim M efC queries.u8 nq k ef \
//       out_ids [out_dists.i32]
//     (uint8 data over L2SpaceI (space_l2.h:294-323), integer distances —
//      the baseline for the repo's exact l2u8 tier. With [out_dists.i32],
//      also writes the raw int top-k distances for bit-exact comparison.)
//
// Reads raw little-endian float32 row-major arrays, builds a
// HierarchicalNSW<float> over an L2Space (single thread, sequential
// labels 0..n-1), runs searchKnn per query (single core, timed), and
// writes the top-k labels as int64 [nq, k] (-1 padded). Prints ONE JSON
// line with build/query timing to stdout. With [adj_out], also exports
// the built graph in the reference `.adj` format
// (index_builder/build.cpp:14-21) so the repo's io/adj.py reader can be
// validated against a graph the reference engine itself produced.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "hnswalg.h"
#include "stop_condition.h"

static std::vector<float> read_f32(const std::string &path, size_t count) {
    std::ifstream in(path, std::ios::binary);
    if (!in) { fprintf(stderr, "cannot open %s\n", path.c_str()); exit(2); }
    std::vector<float> v(count);
    in.read(reinterpret_cast<char *>(v.data()), count * sizeof(float));
    if (!in) { fprintf(stderr, "short read from %s\n", path.c_str()); exit(2); }
    return v;
}

// Reference .adj writer semantics (index_builder/build.cpp:14-107):
// header {entrypoint, max_level, node_count} u32, then per node in
// internal-id order: {label, levels} u32, per level {deg, deg x u32
// neighbor internal ids}.
static void export_adj(hnswlib::HierarchicalNSW<float> &alg,
                       const std::string &path) {
    std::ofstream out(path, std::ios::binary);
    auto w32 = [&](uint32_t v) {
        out.write(reinterpret_cast<const char *>(&v), 4);
    };
    uint32_t n = static_cast<uint32_t>(alg.cur_element_count.load());
    w32(static_cast<uint32_t>(alg.enterpoint_node_));
    w32(static_cast<uint32_t>(alg.maxlevel_));
    w32(n);
    for (uint32_t i = 0; i < n; i++) {
        w32(static_cast<uint32_t>(alg.getExternalLabel(i)));
        uint32_t levels = static_cast<uint32_t>(alg.element_levels_[i]) + 1;
        w32(levels);
        for (uint32_t l = 0; l < levels; l++) {
            hnswlib::linklistsizeint *ll = alg.get_linklist_at_level(i, l);
            uint32_t deg = alg.getListCount(ll);
            w32(deg);
            hnswlib::tableint *nb = reinterpret_cast<hnswlib::tableint *>(ll + 1);
            for (uint32_t d = 0; d < deg; d++) w32(static_cast<uint32_t>(nb[d]));
        }
    }
}

static std::vector<uint8_t> read_u8(const std::string &path, size_t count) {
    std::ifstream in(path, std::ios::binary);
    if (!in) { fprintf(stderr, "cannot open %s\n", path.c_str()); exit(2); }
    std::vector<uint8_t> v(count);
    in.read(reinterpret_cast<char *>(v.data()), count);
    if (!in) { fprintf(stderr, "short read from %s\n", path.c_str()); exit(2); }
    return v;
}

// uint8 / integer-distance path (L2SpaceI, space_l2.h:294-323): the
// baseline for the repo's exact `l2u8` storage tier.
static int run_u8(int argc, char **argv) {
    size_t n = strtoull(argv[3], nullptr, 10);
    size_t dim = strtoull(argv[4], nullptr, 10);
    size_t M = strtoull(argv[5], nullptr, 10);
    size_t efC = strtoull(argv[6], nullptr, 10);
    size_t nq = strtoull(argv[8], nullptr, 10);
    size_t k = strtoull(argv[9], nullptr, 10);
    size_t ef = strtoull(argv[10], nullptr, 10);
    std::vector<uint8_t> data = read_u8(argv[2], n * dim);
    std::vector<uint8_t> queries = read_u8(argv[7], nq * dim);

    hnswlib::L2SpaceI space(dim);
    hnswlib::HierarchicalNSW<int> alg(&space, n, M, efC, /*seed=*/100);
    auto t0 = std::chrono::steady_clock::now();
    for (size_t i = 0; i < n; i++)
        alg.addPoint(data.data() + i * dim,
                     static_cast<hnswlib::labeltype>(i));
    double build_s =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
            .count();

    alg.setEf(ef);
    std::vector<int64_t> ids(nq * k, -1);
    std::vector<int32_t> dists(nq * k, -1);
    t0 = std::chrono::steady_clock::now();
    for (size_t qi = 0; qi < nq; qi++) {
        auto heap = alg.searchKnn(queries.data() + qi * dim, k);
        size_t got = heap.size();
        for (size_t j = got; j-- > 0;) {
            ids[qi * k + j] = static_cast<int64_t>(heap.top().second);
            dists[qi * k + j] = heap.top().first;
            heap.pop();
        }
    }
    double query_s =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
            .count();

    std::ofstream out(argv[11], std::ios::binary);
    out.write(reinterpret_cast<const char *>(ids.data()),
              ids.size() * sizeof(int64_t));
    out.close();
    if (argc > 12) {
        std::ofstream dout(argv[12], std::ios::binary);
        dout.write(reinterpret_cast<const char *>(dists.data()),
                   dists.size() * sizeof(int32_t));
    }
    printf("{\"build_s\": %.3f, \"query_s\": %.3f, \"qps\": %.1f, "
           "\"max_level\": %d}\n",
           build_s, query_s, nq / query_s, alg.maxlevel_);
    return 0;
}

// loadIndex path (hnswalg.h:716-822): load a .bin saved by either engine,
// search, write ids — the acceptance test for the repo's write_bin and the
// producer of real-engine .bin fixtures (via build_save below).
//   xcheck_hnswlib load_search <index.bin> <dim> <queries.f32> <nq> <k> <ef>
//       <out_ids.i64> [u8]
// With trailing "u8", loads over L2SpaceI and reads u8 queries.
static int run_load_search(int argc, char **argv) {
    if (argc < 9) {
        fprintf(stderr, "usage: %s load_search index.bin dim queries nq k ef "
                        "out_ids [u8]\n", argv[0]);
        return 2;
    }
    std::string bin_path = argv[2];
    size_t dim = strtoull(argv[3], nullptr, 10);
    size_t nq = strtoull(argv[5], nullptr, 10);
    size_t k = strtoull(argv[6], nullptr, 10);
    size_t ef = strtoull(argv[7], nullptr, 10);
    bool u8 = argc > 9 && std::string(argv[9]) == "u8";

    std::vector<int64_t> ids(nq * k, -1);
    double query_s;
    if (u8) {
        std::vector<uint8_t> queries = read_u8(argv[4], nq * dim);
        hnswlib::L2SpaceI space(dim);
        hnswlib::HierarchicalNSW<int> alg(&space, bin_path);
        alg.setEf(ef);
        auto t0 = std::chrono::steady_clock::now();
        for (size_t qi = 0; qi < nq; qi++) {
            auto heap = alg.searchKnn(queries.data() + qi * dim, k);
            size_t got = heap.size();
            for (size_t j = got; j-- > 0;) {
                ids[qi * k + j] = static_cast<int64_t>(heap.top().second);
                heap.pop();
            }
        }
        query_s = std::chrono::duration<double>(
                      std::chrono::steady_clock::now() - t0).count();
    } else {
        std::vector<float> queries = read_f32(argv[4], nq * dim);
        hnswlib::L2Space space(dim);
        hnswlib::HierarchicalNSW<float> alg(&space, bin_path);
        alg.setEf(ef);
        auto t0 = std::chrono::steady_clock::now();
        for (size_t qi = 0; qi < nq; qi++) {
            auto heap = alg.searchKnn(queries.data() + qi * dim, k);
            size_t got = heap.size();
            for (size_t j = got; j-- > 0;) {
                ids[qi * k + j] = static_cast<int64_t>(heap.top().second);
                heap.pop();
            }
        }
        query_s = std::chrono::duration<double>(
                      std::chrono::steady_clock::now() - t0).count();
    }
    std::ofstream out(argv[8], std::ios::binary);
    out.write(reinterpret_cast<const char *>(ids.data()),
              ids.size() * sizeof(int64_t));
    printf("{\"query_s\": %.3f, \"qps\": %.1f}\n", query_s, nq / query_s);
    return 0;
}

struct MaskFilter : hnswlib::BaseFilterFunctor {
    const uint8_t *mask;
    explicit MaskFilter(const uint8_t *m) : mask(m) {}
    bool operator()(hnswlib::labeltype label) override {
        return mask[label] != 0;
    }
};

// loadIndex + filtered search: the per-query-functor parity producer
// (hnswlib.h:128-132 — the reference evaluates its filter per searchKnn
// call, i.e. per query; run this once per distinct mask).
//   xcheck_hnswlib load_filter_search <index.bin> <dim> <queries.f32> <nq>
//       <k> <ef> <out_ids.i64> <mask.u8> <mask_len>
static int run_load_filter_search(int argc, char **argv) {
    if (argc < 11) {
        fprintf(stderr, "usage: %s load_filter_search index.bin dim queries "
                        "nq k ef out_ids mask.u8 mask_len\n", argv[0]);
        return 2;
    }
    size_t dim = strtoull(argv[3], nullptr, 10);
    size_t nq = strtoull(argv[5], nullptr, 10);
    size_t k = strtoull(argv[6], nullptr, 10);
    size_t ef = strtoull(argv[7], nullptr, 10);
    size_t mask_len = strtoull(argv[10], nullptr, 10);
    std::vector<float> queries = read_f32(argv[4], nq * dim);
    std::vector<uint8_t> mask = read_u8(argv[9], mask_len);
    MaskFilter filt(mask.data());

    hnswlib::L2Space space(dim);
    hnswlib::HierarchicalNSW<float> alg(&space, argv[2]);
    alg.setEf(ef);
    std::vector<int64_t> ids(nq * k, -1);
    for (size_t qi = 0; qi < nq; qi++) {
        auto heap = alg.searchKnn(queries.data() + qi * dim, k, &filt);
        size_t got = heap.size();
        for (size_t j = got; j-- > 0;) {
            ids[qi * k + j] = static_cast<int64_t>(heap.top().second);
            heap.pop();
        }
    }
    std::ofstream out(argv[8], std::ios::binary);
    out.write(reinterpret_cast<const char *>(ids.data()),
              ids.size() * sizeof(int64_t));
    printf("{\"nq\": %zu}\n", nq);
    return 0;
}

int main(int argc, char **argv) {
    std::string mode = argc > 1 ? argv[1] : "";
    bool churn = mode == "build_churn_search";
    bool filter = mode == "build_filter_search";
    bool eps = mode == "build_epsilon_search";
    if (argc >= 12 && mode == "build_search_u8") return run_u8(argc, argv);
    if (mode == "load_search") return run_load_search(argc, argv);
    if (mode == "load_filter_search") return run_load_filter_search(argc, argv);
    if (argc < 11 ||
        (mode != "build_search" && !churn && !filter && !eps) ||
        (churn && argc < 15) || (filter && argc < 13) ||
        (eps && argc < 15)) {
        fprintf(stderr, "usage: %s build_search data n dim M efC queries nq "
                        "k ef out_ids [adj_out]\n"
                        "       %s build_churn_search data n dim M efC "
                        "queries nq k ef out_ids upd.f32 "
                        "upd_ids.u32 nu\n"
                        "       %s build_filter_search data n dim M efC "
                        "queries nq k ef out_ids mask.u8\n",
                argv[0], argv[0], argv[0]);
        return 2;
    }
    std::string data_path = argv[2];
    size_t n = strtoull(argv[3], nullptr, 10);
    size_t dim = strtoull(argv[4], nullptr, 10);
    size_t M = strtoull(argv[5], nullptr, 10);
    size_t efC = strtoull(argv[6], nullptr, 10);
    std::string q_path = argv[7];
    size_t nq = strtoull(argv[8], nullptr, 10);
    size_t k = strtoull(argv[9], nullptr, 10);
    size_t ef = strtoull(argv[10], nullptr, 10);
    std::string out_path = argv[11];
    // churn/filter/epsilon modes repurpose argv[12..] (no adj export there)
    std::string adj_out =
        (!churn && !filter && !eps && argc > 12) ? argv[12] : "";
    // optional native saveIndex export (hnswalg.h:685-713): the real-engine
    // .bin fixture for the repo's read_bin / from_hnswlib ("" skips)
    std::string bin_out =
        (!churn && !filter && !eps && argc > 13) ? argv[13] : "";

    std::vector<float> data = read_f32(data_path, n * dim);
    std::vector<float> queries = read_f32(q_path, nq * dim);

    hnswlib::L2Space space(dim);
    hnswlib::HierarchicalNSW<float> alg(&space, n, M, efC, /*seed=*/100);

    auto t0 = std::chrono::steady_clock::now();
    for (size_t i = 0; i < n; i++)
        alg.addPoint(data.data() + i * dim, static_cast<hnswlib::labeltype>(i));
    double build_s =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
            .count();

    double churn_s = 0.0;
    if (churn) {
        size_t nu = strtoull(argv[14], nullptr, 10);
        std::vector<float> upd = read_f32(argv[12], nu * dim);
        std::vector<uint32_t> upd_ids(nu);
        {
            std::ifstream in(argv[13], std::ios::binary);
            in.read(reinterpret_cast<char *>(upd_ids.data()), nu * 4);
            if (!in) { fprintf(stderr, "short read %s\n", argv[13]); return 2; }
        }
        t0 = std::chrono::steady_clock::now();
        // existing label -> updatePoint path (hnswalg.h:965-977)
        for (size_t j = 0; j < nu; j++)
            alg.addPoint(upd.data() + j * dim,
                         static_cast<hnswlib::labeltype>(upd_ids[j]));
        churn_s = std::chrono::duration<double>(
                      std::chrono::steady_clock::now() - t0).count();
    }

    std::vector<uint8_t> mask;
    MaskFilter mask_filter(nullptr);
    if (filter) {
        mask.resize(n);
        std::ifstream in(argv[12], std::ios::binary);
        in.read(reinterpret_cast<char *>(mask.data()), n);
        if (!in) { fprintf(stderr, "short read %s\n", argv[12]); return 2; }
        mask_filter.mask = mask.data();
    }

    if (eps) {
        float epsilon = strtof(argv[12], nullptr);
        size_t min_c = strtoull(argv[13], nullptr, 10);
        size_t max_c = strtoull(argv[14], nullptr, 10);
        std::vector<int64_t> eids(nq * max_c, -1);
        t0 = std::chrono::steady_clock::now();
        for (size_t qi = 0; qi < nq; qi++) {
            hnswlib::EpsilonSearchStopCondition<float> sc(epsilon, min_c,
                                                          max_c);
            auto res = alg.searchStopConditionClosest(
                queries.data() + qi * dim, sc);
            for (size_t j = 0; j < res.size() && j < max_c; j++)
                eids[qi * max_c + j] = static_cast<int64_t>(res[j].second);
        }
        double eps_s = std::chrono::duration<double>(
                           std::chrono::steady_clock::now() - t0).count();
        std::ofstream out(out_path, std::ios::binary);
        out.write(reinterpret_cast<const char *>(eids.data()),
                  eids.size() * sizeof(int64_t));
        printf("{\"build_s\": %.3f, \"query_s\": %.3f, \"qps\": %.1f}\n",
               build_s, eps_s, nq / eps_s);
        return 0;
    }

    alg.setEf(ef);
    std::vector<int64_t> ids(nq * k, -1);
    t0 = std::chrono::steady_clock::now();
    for (size_t qi = 0; qi < nq; qi++) {
        auto heap = alg.searchKnn(queries.data() + qi * dim, k,
                                  filter ? &mask_filter : nullptr);
        size_t got = heap.size();
        // max-heap pops worst first; fill back-to-front for ascending order
        for (size_t j = got; j-- > 0;) {
            ids[qi * k + j] = static_cast<int64_t>(heap.top().second);
            heap.pop();
        }
    }
    double query_s =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
            .count();

    std::ofstream out(out_path, std::ios::binary);
    out.write(reinterpret_cast<const char *>(ids.data()),
              ids.size() * sizeof(int64_t));
    out.close();

    if (!adj_out.empty()) export_adj(alg, adj_out);
    if (!bin_out.empty()) alg.saveIndex(bin_out);

    printf("{\"build_s\": %.3f, \"query_s\": %.3f, \"qps\": %.1f, "
           "\"max_level\": %d, \"entrypoint\": %u, \"churn_s\": %.3f}\n",
           build_s, query_s, nq / query_s, alg.maxlevel_,
           static_cast<unsigned>(alg.enterpoint_node_), churn_s);
    return 0;
}
