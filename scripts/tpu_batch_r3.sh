#!/bin/bash
# Round-3 on-device batch: waits for the axon tunnel to come back, then
# validates all Pallas kernels and records the canonical numbers.
# Runs detached; logs to /tmp/tpu_batch_r3.log.  Each probe attempt can
# take ~20 min to fail while the tunnel is down (backend init timeout).
cd /root/repo || exit 1
log=/tmp/tpu_batch_r3.log
echo "== batch start $(date) ==" >> "$log"
up=0
for i in $(seq 1 60); do
  if python -c "import jax; print(jax.devices())" >> "$log" 2>&1; then
    up=1; break
  fi
  echo "tunnel down, retry $i $(date)" >> "$log"
  sleep 180
done
if [ "$up" != 1 ]; then echo "GAVE UP $(date)" >> "$log"; exit 1; fi
echo "== validate kernels $(date) ==" >> "$log"
python scripts/tpu_validate_kernels.py >> "$log" 2>&1
echo "validate exit=$? $(date)" >> "$log"
echo "== headline bench $(date) ==" >> "$log"
python bench.py >> "$log" 2>&1
echo "bench exit=$? $(date)" >> "$log"
echo "== suite --write-md $(date) ==" >> "$log"
python benches/suite.py --write-md >> "$log" 2>&1
echo "suite exit=$? $(date)" >> "$log"
echo "== batch done $(date) ==" >> "$log"
