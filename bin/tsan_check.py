#!/usr/bin/env python
"""Build and run the TSan concurrency stress for the native builder
(VERDICT r2 item 8): concurrent insert batches + a live reader thread under
ThreadSanitizer, then graph invariants. Writes res/tsan_builder.log.

Usage: python bin/tsan_check.py
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "hnsw_tpu", "native")
RES = os.path.join(REPO, "res")


def main():
    exe = os.path.join(NATIVE, "bin_tsan_stress")
    cmd = [
        "g++", "-fsanitize=thread", "-O1", "-g", "-std=c++20", "-pthread",
        "-o", exe, os.path.join(NATIVE, "tsan_stress.cpp"),
    ]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)
    env = dict(os.environ, TSAN_OPTIONS="halt_on_error=0 exitcode=66")
    r = subprocess.run(
        [exe], env=env, capture_output=True, text=True, timeout=1200
    )
    log = r.stdout + r.stderr
    os.makedirs(RES, exist_ok=True)
    with open(os.path.join(RES, "tsan_builder.log"), "w") as f:
        f.write(f"$ {' '.join(cmd)}\n$ TSAN_OPTIONS=... {exe}\n")
        f.write(log)
        f.write(f"\nexit code: {r.returncode}\n")
    print(log)
    races = log.count("WARNING: ThreadSanitizer")
    if r.returncode != 0 or races:
        print(f"TSAN FAIL: rc={r.returncode} races={races}")
        return 1
    print("TSAN clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
