#!/bin/bash
# Restart driver for the 32M sharded sweep (8x 4M int4-unified (serve-trim) shards):
# the axon relay occasionally poisons a process (one RESOURCE_EXHAUSTED
# and every later transfer fails — see CLAUDE.md), so edge-of-HBM runs go
# through an outer restart loop. All expensive phases are resumable
# (per-shard GT cache, shard build checkpoints, per-shard result files
# under /tmp/sweep32m_state).
cd "$(dirname "$0")/.." || exit 1
for attempt in $(seq 1 20); do
  echo "=== sweep32m attempt $attempt $(date -u +%H:%M:%S) ==="
  python -u bin/sweep32m.py "$@" && exit 0
  echo "=== attempt $attempt failed (rc=$?); restarting in 30s ==="
  sleep 30
done
exit 1
