// Native HNSW query service binary (reference parity: hnsw_service/main.cpp,
// a C++ executable — SURVEY.md marks C10/C11 "native").
//
// Two modes, like the reference (main.cpp:51-147):
//  - normal:    loads the .adj graph and pulls ALL vectors from the storage
//               service in one bulk transfer at startup; searches in memory
//               (the reference loads the full hnswlib index instead).
//  - optimized: storage/compute split — only the adjacency lives here;
//               vectors are fetched from the storage service during
//               traversal, one *batched* POST per hop rather than the
//               reference's one GET per node (hnsw_graph.cpp:174-212), with
//               the same retry x3 / linear backoff.
//
// A RLIMIT_AS self-cap makes the memory-reduction claim falsifiable
// (reference main.cpp:19-22; default 2GB, --mem_cap_mb to change/0 to drop).
//
// The TPU device serving path remains the Python query_service (device HBM
// holds the index; a C++ process cannot own the XLA client) — this binary
// covers the reference's native CPU serving surface.
//
// Endpoints (wire parity with hnsw_service/main.cpp:59-153 and the Python
// frontend): POST /search {"query": [..], "k": int, "ef": int,
// "entry_id": int} -> {"results": [{"id","distance"}...], "rss_kb", "mode"};
// GET /info; GET /mem.
//
// Usage: hnsw_service --graph g.adj --storage http://127.0.0.1:8081
//        --port 8080 --ef 200 --k 10 --optimized 0|1 --dim 128
//        --mem_cap_mb 2048

#include "httpkit.h"

#include <sys/resource.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <limits>
#include <mutex>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct AdjGraph {
  uint32_t entry = 0;
  uint32_t max_level = 0;
  uint32_t n = 0;
  std::vector<int64_t> labels;
  std::vector<uint32_t> node_level;
  // per node, per level: neighbor list (flattened with offsets)
  std::vector<std::vector<std::vector<uint32_t>>> adj;  // [node][level][i]
};

bool load_adj(const char* path, AdjGraph* g) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  auto rd = [&](uint32_t* v) { return fread(v, 4, 1, f) == 1; };
  uint32_t hdr[3];
  if (fread(hdr, 4, 3, f) != 3) return fclose(f), false;
  g->entry = hdr[0];
  g->max_level = hdr[1];
  g->n = hdr[2];
  g->labels.resize(g->n);
  g->node_level.resize(g->n);
  g->adj.resize(g->n);
  for (uint32_t i = 0; i < g->n; ++i) {
    uint32_t label, levels;
    if (!rd(&label) || !rd(&levels)) return fclose(f), false;
    g->labels[i] = int64_t(label);
    g->node_level[i] = levels - 1;
    g->adj[i].resize(levels);
    for (uint32_t l = 0; l < levels; ++l) {
      uint32_t deg;
      if (!rd(&deg)) return fclose(f), false;
      g->adj[i][l].resize(deg);
      if (deg && fread(g->adj[i][l].data(), 4, deg, f) != deg)
        return fclose(f), false;
    }
  }
  fclose(f);
  return true;
}

inline float l2_sq(const float* a, const float* b, int dim) {
  float acc = 0.f;
  for (int i = 0; i < dim; ++i) {
    float d = a[i] - b[i];
    acc += d * d;
  }
  return acc;
}

struct Cand {
  float dist;
  uint32_t id;
};
struct Closer {
  bool operator()(const Cand& a, const Cand& b) const { return a.dist > b.dist; }
};
struct Farther {
  bool operator()(const Cand& a, const Cand& b) const { return a.dist < b.dist; }
};

// Vector source: local table (normal mode) or remote fetch-through cache
// (optimized mode; reference C11's fetch_vector with retry x3,
// hnsw_graph.cpp:184-209, but batched per hop).
struct VecSource {
  int dim = 0;
  bool remote = false;
  std::vector<float> table;          // [n, dim] (normal mode)
  std::string host;
  int port = 0;
  std::unordered_map<uint32_t, std::vector<float>> cache;
  std::mutex mu;
  size_t cache_cap = 4096;  // bounded: keeps optimized-mode RSS low

  const float* get_local(uint32_t id) const {
    return table.data() + size_t(id) * dim;
  }

  // ensure ids are present in cache (one batched POST, retry x3)
  bool prefetch(const std::vector<uint32_t>& ids) {
    std::string body = "[";
    bool any = false;
    {
      std::lock_guard<std::mutex> g(mu);
      for (uint32_t id : ids) {
        if (cache.count(id)) continue;
        if (any) body += ",";
        body += std::to_string(id);
        any = true;
      }
    }
    if (!any) return true;
    body += "]";
    std::string out;
    for (int attempt = 0; attempt < 3; ++attempt) {
      if (httpkit::request(host, port, "POST", "/vec/batch_get", body, &out))
        break;
      if (attempt == 2) return false;
      usleep(useconds_t(200000 * (attempt + 1)));  // linear backoff
    }
    // parse [[floats]|null, ...] positionally against the requested ids
    std::vector<uint32_t> want;
    {
      std::lock_guard<std::mutex> g(mu);
      for (uint32_t id : ids)
        if (!cache.count(id)) want.push_back(id);
    }
    const char* p = out.c_str();
    while (*p && *p != '[') ++p;
    if (*p) ++p;
    size_t wi = 0;
    std::lock_guard<std::mutex> g(mu);
    while (*p && wi < want.size()) {
      while (*p && (isspace((unsigned char)*p) || *p == ',')) ++p;
      if (*p == ']') break;
      if (strncmp(p, "null", 4) == 0) {
        p += 4;
        ++wi;
        continue;
      }
      if (*p != '[') break;
      std::vector<float> v;
      if (!httpkit::json_parse_floats(p, &v)) break;
      // advance past this array
      int depth = 0;
      while (*p) {
        if (*p == '[') ++depth;
        if (*p == ']' && --depth == 0) {
          ++p;
          break;
        }
        ++p;
      }
      if (int(v.size()) == dim) {
        if (cache.size() >= cache_cap) cache.clear();  // simple bound
        cache.emplace(want[wi], std::move(v));
      }
      ++wi;
    }
    return true;
  }

  const float* get(uint32_t id) {
    if (!remote) return get_local(id);
    std::lock_guard<std::mutex> g(mu);
    auto it = cache.find(id);
    return it == cache.end() ? nullptr : it->second.data();
  }
};

struct Engine {
  AdjGraph g;
  VecSource vs;
  int default_k = 10, default_ef = 200;
  bool optimized = false;

  // searchKnn semantics (hnswalg.h:1271-1324) over the .adj lists.
  std::vector<Cand> search(const float* q, int k, int ef, long entry_override) {
    uint32_t ep = g.entry;
    if (entry_override >= 0 && uint32_t(entry_override) < g.n)
      ep = uint32_t(entry_override);
    if (g.n == 0) return {};
    if (optimized) vs.prefetch({ep});
    const float* epv = vs.get(ep);
    if (!epv) return {};
    float ep_d = l2_sq(q, epv, vs.dim);

    // greedy upper descent
    for (uint32_t l = g.max_level; l >= 1; --l) {
      bool changed = true;
      while (changed) {
        changed = false;
        if (g.node_level[ep] < l) break;
        const auto& nb = g.adj[ep][l];
        if (optimized) vs.prefetch(nb);
        for (uint32_t cand : nb) {
          const float* cv = vs.get(cand);
          if (!cv) continue;  // skip-on-error (hnsw_graph.cpp:329-331)
          float d = l2_sq(q, cv, vs.dim);
          if (d < ep_d) {
            ep_d = d;
            ep = cand;
            changed = true;
          }
        }
      }
    }

    // level-0 beam
    std::priority_queue<Cand, std::vector<Cand>, Closer> candidates;
    std::priority_queue<Cand, std::vector<Cand>, Farther> results;
    std::vector<uint8_t> visited(g.n, 0);
    visited[ep] = 1;
    candidates.push({ep_d, ep});
    results.push({ep_d, ep});
    float lower = ep_d;
    size_t ef_s = size_t(std::max(ef, k));
    std::vector<uint32_t> fresh;
    while (!candidates.empty()) {
      Cand c = candidates.top();
      if (c.dist > lower && results.size() >= ef_s) break;
      candidates.pop();
      const auto& nb = g.adj[c.id][0];
      fresh.clear();
      for (uint32_t cand : nb)
        if (!visited[cand]) fresh.push_back(cand);
      if (optimized && !fresh.empty()) vs.prefetch(fresh);
      for (uint32_t cand : fresh) {
        visited[cand] = 1;
        const float* cv = vs.get(cand);
        if (!cv) continue;
        float d = l2_sq(q, cv, vs.dim);
        if (results.size() < ef_s || d < lower) {
          candidates.push({d, cand});
          results.push({d, cand});
          if (results.size() > ef_s) results.pop();
          if (results.size() >= ef_s) lower = results.top().dist;
        }
      }
    }
    std::vector<Cand> out;
    while (!results.empty()) {
      out.push_back(results.top());
      results.pop();
    }
    std::reverse(out.begin(), out.end());
    if (int(out.size()) > k) out.resize(size_t(k));
    return out;
  }
};

bool parse_host_port(const std::string& url, std::string* host, int* port) {
  std::string s = url;
  size_t p = s.find("://");
  if (p != std::string::npos) s = s.substr(p + 3);
  p = s.find(':');
  if (p == std::string::npos) return false;
  *host = s.substr(0, p);
  *port = atoi(s.c_str() + p + 1);
  return true;
}

}  // namespace

int main(int argc, char** argv) {
  std::string graph = "./hnsw_index.adj";
  std::string storage = "http://127.0.0.1:8081";
  int port = 8080, ef = 200, k = 10, dim = 128;
  long mem_cap_mb = 2048;
  bool optimized = false;
  for (int i = 1; i + 1 < argc; i += 2) {
    std::string a = argv[i];
    if (a == "--graph") graph = argv[i + 1];
    else if (a == "--storage") storage = argv[i + 1];
    else if (a == "--port") port = atoi(argv[i + 1]);
    else if (a == "--ef") ef = atoi(argv[i + 1]);
    else if (a == "--k") k = atoi(argv[i + 1]);
    else if (a == "--dim") dim = atoi(argv[i + 1]);
    else if (a == "--mem_cap_mb") mem_cap_mb = atol(argv[i + 1]);
    else if (a == "--optimized")
      optimized = std::string(argv[i + 1]) == "1" ||
                  std::string(argv[i + 1]) == "true";
  }

  if (mem_cap_mb > 0) {
    // reference hnsw_service/main.cpp:19-22: deterministic OOM envelope
    rlimit lim{rlim_t(mem_cap_mb) << 20, rlim_t(mem_cap_mb) << 20};
    setrlimit(RLIMIT_AS, &lim);
  }

  auto* eng = new Engine();
  eng->default_k = k;
  eng->default_ef = ef;
  eng->optimized = optimized;
  eng->vs.dim = dim;
  if (!load_adj(graph.c_str(), &eng->g)) {
    fprintf(stderr, "cannot load graph %s\n", graph.c_str());
    return 1;
  }
  std::string host;
  int sport = 0;
  if (!parse_host_port(storage, &host, &sport)) {
    fprintf(stderr, "bad storage url %s\n", storage.c_str());
    return 1;
  }
  eng->vs.host = host;
  eng->vs.port = sport;
  eng->vs.remote = optimized;

  if (!optimized) {
    // one bulk transfer, retry x3 with linear backoff
    std::string out;
    bool ok = false;
    // startup bulk fetch: retry longer than the reference's per-vector x3
    // (the storage service may still be coming up; capped linear backoff)
    for (int attempt = 0; attempt < 15; ++attempt) {
      if ((ok = httpkit::request(host, sport, "GET",
                                 "/vec/bulk?dim=" + std::to_string(dim), "",
                                 &out, 300)))
        break;
      usleep(useconds_t(std::min(1000000 * (attempt + 1), 2000000)));
    }
    if (!ok || out.size() < 8) {
      fprintf(stderr, "bulk vector fetch failed\n");
      return 1;
    }
    uint32_t count, d;
    memcpy(&count, out.data(), 4);
    memcpy(&d, out.data() + 4, 4);
    if (int(d) != dim) {
      fprintf(stderr, "dim mismatch\n");
      return 1;
    }
    // storage ids are labels; map onto internal order
    std::unordered_map<int64_t, uint32_t> label_to_id;
    for (uint32_t i = 0; i < eng->g.n; ++i)
      label_to_id[eng->g.labels[i]] = i;
    eng->vs.table.assign(size_t(eng->g.n) * dim, 0.f);
    size_t rec = 4 + size_t(dim) * 4;
    for (uint32_t i = 0; i < count; ++i) {
      const char* p = out.data() + 8 + size_t(i) * rec;
      uint32_t sid;
      memcpy(&sid, p, 4);
      auto it = label_to_id.find(int64_t(sid));
      if (it == label_to_id.end()) continue;
      memcpy(eng->vs.table.data() + size_t(it->second) * dim, p + 4,
             size_t(dim) * 4);
    }
  }

  httpkit::Server srv;
  srv.route("POST", "/search", [eng](const httpkit::Request& req,
                                     httpkit::Response& resp) {
    const char* qp = httpkit::json_find_key(req.body, "query");
    std::vector<float> q;
    if (!qp || !httpkit::json_parse_floats(qp, &q) ||
        int(q.size()) != eng->vs.dim) {
      resp.status = 400;
      resp.body = "{\"error\": \"bad query\"}";
      return;
    }
    int k = int(httpkit::json_long(req.body, "k", eng->default_k));
    int ef = int(httpkit::json_long(req.body, "ef", eng->default_ef));
    long entry = httpkit::json_long(req.body, "entry_id", -1);
    auto res = eng->search(q.data(), k, ef, entry);
    std::string out = "{\"results\": [";
    char num[64];
    for (size_t i = 0; i < res.size(); ++i) {
      snprintf(num, sizeof(num), "%s{\"id\": %lld, \"distance\": %.9g}",
               i ? "," : "", (long long)eng->g.labels[res[i].id],
               double(res[i].dist));
      out += num;
    }
    out += "], \"rss_kb\": " + std::to_string(httpkit::self_rss_kb());
    if (eng->optimized) out += ", \"mode\": \"optimized\"";
    out += "}";
    resp.body = std::move(out);
  });

  srv.route("GET", "/info", [eng](const httpkit::Request&,
                                  httpkit::Response& resp) {
    resp.body = "{\"nodes\": " + std::to_string(eng->g.n) +
                ", \"dim\": " + std::to_string(eng->vs.dim) +
                ", \"ef\": " + std::to_string(eng->default_ef) +
                ", \"mode\": \"" +
                (eng->optimized ? "optimized" : "normal") + "\"}";
  });

  srv.route("GET", "/mem", [](const httpkit::Request&,
                              httpkit::Response& resp) {
    resp.body = "{\"rss_kb\": " + std::to_string(httpkit::self_rss_kb()) + "}";
  });

  printf("hnsw query service (native, %s) listening on port %d\n",
         optimized ? "optimized" : "normal", port);
  fflush(stdout);
  if (!srv.listen_and_serve(port)) {
    fprintf(stderr, "bind/listen failed on %d\n", port);
    return 1;
  }
  return 0;
}
