"""Compile helpers for the hnswlib cross-validation harness.

Builds the two test-only binaries against the REFERENCE tree
(/root/reference — public untrusted content, compiled and run isolated
under tests/, never linked into hnsw_tpu):

- xcheck_hnswlib: the vendored hnswlib engine (hnswlib/hnswalg.h),
  SIMD enabled (-DUSE_SSE/AVX/AVX512, like upstream wheels) so the
  recorded single-core baseline is the strongest honest one.
- xcheck_adj: the reference's own .adj loader
  (hnsw_service/hnsw_graph.cpp) + a dump driver.

Binaries are cached in /tmp keyed by source hash. Returns None when the
toolchain or the reference tree is absent (tests skip cleanly).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess

HERE = os.path.dirname(os.path.abspath(__file__))
REF = os.environ.get("HNSW_REFERENCE_DIR", "/root/reference")


def _available() -> bool:
    return shutil.which("g++") is not None and os.path.isdir(
        os.path.join(REF, "hnswlib")
    )


def _build(tag: str, cmd_tail: list[str], src_paths: list[str]) -> str | None:
    if not _available():
        return None
    h = hashlib.sha256()
    for p in src_paths:
        with open(p, "rb") as f:
            h.update(f.read())
    h.update(" ".join(cmd_tail).encode())
    out = f"/tmp/{tag}_{h.hexdigest()[:16]}"
    if os.path.exists(out):
        return out
    r = subprocess.run(
        ["g++", "-O3", "-std=c++17", "-o", out] + cmd_tail,
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        raise RuntimeError(f"{tag} compile failed:\n{r.stderr[-3000:]}")
    return out


def build_xcheck_hnswlib() -> str | None:
    src = os.path.join(HERE, "xcheck_hnswlib.cpp")
    return _build(
        "xcheck_hnswlib",
        [src, f"-I{os.path.join(REF, 'hnswlib')}",
         "-DUSE_SSE", "-DUSE_AVX", "-DUSE_AVX512", "-march=native",
         "-pthread"],
        [src],
    )


def build_xcheck_adj() -> str | None:
    src = os.path.join(HERE, "xcheck_adj.cpp")
    ref_loader = os.path.join(REF, "hnsw_service", "hnsw_graph.cpp")
    if not os.path.exists(ref_loader):
        return None
    return _build(
        "xcheck_adj",
        [src, ref_loader, f"-I{os.path.join(REF, 'hnsw_service')}",
         "-pthread"],
        [src, ref_loader],
    )
