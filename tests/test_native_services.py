"""Native C++ service frontends: storage + query binaries over HTTP
(reference parity: storage_service/main.cpp, hnsw_service/main.cpp — both
compiled executables, with the RLIMIT_AS self-cap and retry-with-backoff
fetch semantics, hnsw_graph.cpp:184-209)."""

import json
import socket
import struct
import subprocess
import time
import urllib.request

import numpy as np
import pytest

from hnsw_tpu.models.hnsw import HNSWIndex
from hnsw_tpu.native import build_binary

N, DIM = 300, 16


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _wait_ready(port, proc, timeout=90):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if proc.poll() is not None:
            raise RuntimeError(f"service died rc={proc.returncode}")
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/mem", timeout=2
            ) as r:
                r.read()
            return
        except Exception:
            time.sleep(0.2)
    raise TimeoutError("service not ready")


def _post(url, body, timeout=30):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read()


@pytest.fixture(scope="module")
def native_stack(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("native_svc")
    rng = np.random.default_rng(3)
    x = rng.normal(size=(N, DIM)).astype(np.float32)
    idx = HNSWIndex("l2", dim=DIM, m=8, ef_construction=100)
    idx.add_items(x)
    adj = str(tmp / "index.adj")
    idx.export_adj(adj)

    storage_bin = build_binary("storage_main")
    query_bin = build_binary("query_main")
    s_port = _free_port()
    procs = []
    sp = subprocess.Popen(
        [storage_bin, str(tmp / "store.log"), str(s_port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    procs.append(sp)
    _wait_ready(s_port, sp)
    # load vectors through the native put_batch endpoint
    rec = np.zeros(N, dtype=[("id", "<u4"), ("vec", "<f4", (DIM,))])
    rec["id"] = np.arange(N)
    rec["vec"] = x
    body = struct.pack("<II", N, DIM) + rec.tobytes()
    code, resp = _post(f"http://127.0.0.1:{s_port}/vec/put_batch", body)
    assert code == 200 and resp == b"OK"

    q_port = _free_port()
    qp = subprocess.Popen(
        [query_bin, "--graph", adj, "--storage", f"http://127.0.0.1:{s_port}",
         "--port", str(q_port), "--dim", str(DIM), "--ef", "100",
         "--mem_cap_mb", "2048"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    procs.append(qp)
    _wait_ready(q_port, qp)

    o_port = _free_port()
    op = subprocess.Popen(
        [query_bin, "--graph", adj, "--storage", f"http://127.0.0.1:{s_port}",
         "--port", str(o_port), "--dim", str(DIM), "--ef", "100",
         "--optimized", "1", "--mem_cap_mb", "2048"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    procs.append(op)
    _wait_ready(o_port, op)

    yield x, idx, s_port, q_port, o_port
    for p in procs:
        p.terminate()
    for p in procs:
        p.wait(timeout=10)


def test_native_storage_endpoints(native_stack):
    x, idx, s_port, _, _ = native_stack
    base = f"http://127.0.0.1:{s_port}"
    with urllib.request.urlopen(f"{base}/vec/get?id=5", timeout=10) as r:
        j = json.loads(r.read())
    np.testing.assert_allclose(j["values"], x[5], rtol=1e-6)
    code, body = _post(f"{base}/vec/batch_get", json.dumps([1, 99999, 2]).encode())
    got = json.loads(body)
    assert got[1] is None
    np.testing.assert_allclose(got[0], x[1], rtol=1e-6)
    np.testing.assert_allclose(got[2], x[2], rtol=1e-6)
    with urllib.request.urlopen(f"{base}/vec/bulk?dim={DIM}", timeout=10) as r:
        raw = r.read()
    count, d = struct.unpack_from("<II", raw)
    assert count == N and d == DIM
    with urllib.request.urlopen(f"{base}/info", timeout=10) as r:
        assert json.loads(r.read())["count"] == N


@pytest.mark.parametrize("which", ["normal", "optimized"])
def test_native_query_search(native_stack, which):
    """Both native modes must match the host engine's results on self-queries
    (searchKnn semantics over the exported .adj)."""
    x, idx, _, q_port, o_port = native_stack
    port = q_port if which == "normal" else o_port
    d_ref, l_ref, _ = idx.search_cpu(x[:8], 5, 100)
    for i in range(8):
        body = json.dumps({"query": x[i].tolist(), "k": 5, "ef": 100}).encode()
        code, resp = _post(f"http://127.0.0.1:{port}/search", body)
        assert code == 200
        j = json.loads(resp)
        got = [r["id"] for r in j["results"]]
        assert got[0] == i, (which, i, got)
        assert set(got) == set(l_ref[i][: len(got)].tolist())
        assert j["rss_kb"] > 0
        if which == "optimized":
            assert j.get("mode") == "optimized"


def test_native_query_info(native_stack):
    _, _, _, q_port, o_port = native_stack
    for port, mode in ((q_port, "normal"), (o_port, "optimized")):
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/info", timeout=10) as r:
            j = json.loads(r.read())
        assert j["nodes"] == N and j["dim"] == DIM and j["mode"] == mode


def test_concurrent_connection_storm(native_stack):
    """httpkit's fixed worker pool + bounded queue must survive 200
    simultaneous connections (the old thread-per-connection design spawned
    unbounded threads; cpp-httplib — the reference's server — uses a bounded
    pool). Every request must eventually get a correct answer, and idle
    connections must not wedge the pool for later clients."""
    import threading

    x, idx, _, q_port, _ = native_stack
    n_conn, errs, oks = 200, [], []
    lock = threading.Lock()

    def one(i):
        try:
            body = json.dumps(
                {"query": x[i % N].tolist(), "k": 3, "ef": 50}
            ).encode()
            code, resp = _post(
                f"http://127.0.0.1:{q_port}/search", body, timeout=60
            )
            j = json.loads(resp)
            assert code == 200 and j["results"][0]["id"] == i % N
            with lock:
                oks.append(i)
        except Exception as exc:  # collected, asserted below
            with lock:
                errs.append((i, repr(exc)))

    threads = [threading.Thread(target=one, args=(i,)) for i in range(n_conn)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs, errs[:5]
    assert len(oks) == n_conn

    # pool still serves after the storm (no leaked/starved workers)
    code, resp = _post(
        f"http://127.0.0.1:{q_port}/search",
        json.dumps({"query": x[0].tolist(), "k": 3, "ef": 50}).encode(),
    )
    assert code == 200 and json.loads(resp)["results"][0]["id"] == 0


def test_bulk_fetch_retries_until_storage_up(tmp_path):
    """Fault injection (reference retry x3 with backoff,
    hnsw_graph.cpp:184-209): the normal-mode query service starts while the
    storage service is still down; the bulk fetch must retry and succeed
    once storage comes up."""
    rng = np.random.default_rng(4)
    x = rng.normal(size=(100, DIM)).astype(np.float32)
    idx = HNSWIndex("l2", dim=DIM, m=8, ef_construction=80)
    idx.add_items(x)
    adj = str(tmp_path / "g.adj")
    idx.export_adj(adj)

    storage_bin = build_binary("storage_main")
    query_bin = build_binary("query_main")
    s_port = _free_port()
    q_port = _free_port()
    qp = subprocess.Popen(
        [query_bin, "--graph", adj, "--storage", f"http://127.0.0.1:{s_port}",
         "--port", str(q_port), "--dim", str(DIM)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        time.sleep(0.5)  # query service is now inside its retry loop
        sp = subprocess.Popen(
            [storage_bin, str(tmp_path / "s.log"), str(s_port)],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        try:
            _wait_ready(s_port, sp)
            rec = np.zeros(100, dtype=[("id", "<u4"), ("vec", "<f4", (DIM,))])
            rec["id"] = np.arange(100)
            rec["vec"] = x
            _post(
                f"http://127.0.0.1:{s_port}/vec/put_batch",
                struct.pack("<II", 100, DIM) + rec.tobytes(),
            )
            _wait_ready(q_port, qp, timeout=90)
            body = json.dumps({"query": x[3].tolist(), "k": 3, "ef": 50}).encode()
            code, resp = _post(f"http://127.0.0.1:{q_port}/search", body)
            assert code == 200
            assert json.loads(resp)["results"][0]["id"] == 3
        finally:
            sp.terminate(); sp.wait(timeout=10)
    finally:
        qp.terminate(); qp.wait(timeout=10)
