#!/bin/bash
# Full suite in 4 sequential fresh pytest processes (bounds the per-process
# executable/cache state that correlates with the zstd cache segfaults).
export JAX_PLATFORMS=cpu
export XLA_FLAGS=--xla_force_host_platform_device_count=8
export VYOMAI_JAX_CACHE=/tmp/jax_cache_cpu
unset PALLAS_AXON_POOL_IPS
cd /root/repo
files=$(ls tests/test_*.py)
n=$(echo "$files" | wc -l)
per=$(( (n + 3) / 4 ))
d=$(mktemp -d)                 # private shard dir (never glob shared /tmp)
trap 'rm -rf "$d"' EXIT
echo "$files" | split -l $per - "$d/shard_"
rc_all=0
for s in "$d"/shard_*; do
  echo "=== shard $s: $(tr '\n' ' ' < $s)"
  timeout 2400 python -m pytest $(cat $s) -q 2>&1 | tail -3
  rc=${PIPESTATUS[0]}   # pytest's status, not tail's
  echo "shard rc=$rc"
  [ $rc -ne 0 ] && rc_all=$rc
done
echo "ALL SHARDS rc=$rc_all"
exit $rc_all
