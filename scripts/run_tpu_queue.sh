#!/bin/bash
# Sequential TPU job queue: run each "name::command" line one at a time so
# jobs never contend for the single chip.  A global flock serializes
# concurrent queue invocations too.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
exec 9>/tmp/tpu_chip.lock
flock 9
while IFS= read -r line; do
  [ -z "$line" ] && continue
  name="${line%%::*}"
  cmd="${line#*::}"
  echo "=== $name ($(date +%H:%M:%S)) ==="
  bash -c "timeout 1500 $cmd" > "/tmp/tpu_$name.log" 2>&1
  echo "rc=$? -> /tmp/tpu_$name.log"
  tail -4 "/tmp/tpu_$name.log" | grep -v WARNING
done
echo "queue done"
