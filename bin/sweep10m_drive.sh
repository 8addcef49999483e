#!/bin/bash
# Restart driver for the Deep10M-class sharded sweep: the axon relay
# occasionally poisons a process (one RESOURCE_EXHAUSTED and every later
# transfer fails — see CLAUDE.md), so north-star-scale runs go through an
# outer restart loop. All expensive phases are resumable (GT cache, shard
# build checkpoints, per-shard result files under /tmp/sweep10m_state).
cd "$(dirname "$0")/.." || exit 1
for attempt in $(seq 1 20); do
  echo "=== sweep10m attempt $attempt $(date -u +%H:%M:%S) ==="
  python bin/sweep10m.py "$@" && exit 0
  echo "=== attempt $attempt failed (rc=$?); restarting in 30s ==="
  sleep 30
done
exit 1
