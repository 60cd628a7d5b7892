#!/bin/bash
# Round-4 on-device batch: waits for the axon tunnel, then records the
# round's artifacts in dependency order:
#   1. kernel validation  -> VALIDATE_r04.json (on-device bit-exactness proof)
#   2. headline bench     -> one JSON line (mode must be fastlo_fused)
#   3. canonical suite    -> benches/RESULTS.md (spread-annotated rows,
#                            channelizer planes + FM fast-angle rows)
#   4. roofline           -> benches/ROOFLINE*.{md,json} with the Pallas
#                            peak probes (achieved-% must be <= 100 now)
# Runs detached; logs to /tmp/tpu_batch_r4.log.  Probe attempts while the
# tunnel is down can take ~20 min each to fail (backend init timeout), so
# the up-probe runs under its own timeout to keep the retry cadence.
cd /root/repo || exit 1
log=/tmp/tpu_batch_r4.log
echo "== batch start $(date) ==" >> "$log"
up=0
for i in $(seq 1 120); do
  if timeout 300 python -c "import jax; print(jax.devices())" >> "$log" 2>&1; then
    up=1; break
  fi
  echo "tunnel down, retry $i $(date)" >> "$log"
  sleep 120
done
if [ "$up" != 1 ]; then echo "GAVE UP $(date)" >> "$log"; exit 1; fi
echo "== validate kernels $(date) ==" >> "$log"
python scripts/tpu_validate_kernels.py >> "$log" 2>&1
echo "validate exit=$? $(date)" >> "$log"
echo "== headline bench $(date) ==" >> "$log"
python bench.py >> "$log" 2>&1
echo "bench exit=$? $(date) ==" >> "$log"
echo "== suite --write-md $(date) ==" >> "$log"
python benches/suite.py --write-md >> "$log" 2>&1
echo "suite exit=$? $(date)" >> "$log"
echo "== roofline $(date) ==" >> "$log"
python benches/roofline.py >> "$log" 2>&1
echo "roofline exit=$? $(date)" >> "$log"
echo "== batch done $(date) ==" >> "$log"
