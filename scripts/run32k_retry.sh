#!/bin/bash
# Probe-gated retry loop for the 32k HEEV+SBR measurement (co-tenant
# waves on the shared worker make one-shot runs hopeless; CLAUDE.md r4).
# After 6 failed 8.6 GB canaries the gate drops to 6.5 GB: the lean
# stack's early stages fit under 7.7 GB, so a run can start and only
# risks a mid-run OOM at the ~10 GB BT peak if pressure persists.
cd "$(dirname "$0")/.."
for i in $(seq 1 60); do
  echo "=== attempt $i $(date) ==="
  CANARY_GB=1
  timeout 1200 env CANARY_GB=$CANARY_GB python - <<'PY'
import os
import jax, jax.numpy as jnp
k = int(os.environ.get("CANARY_GB", "2"))
y = jnp.zeros((k, 32768, 32768))      # k=2: 8.6 GB, k=1: 4.3 GB
z = jnp.zeros((550, 1024, 1024))      # +2.2 GB alongside
y.ravel()[0].item(); z.ravel()[0].item()
print("canary ok", k)
PY
  if [ $? -ne 0 ]; then echo "canary failed; backoff"; sleep 240; continue; fi
  timeout 5400 env HEEV32K_SBR=${HEEV32K_SBR:-1024} HEEV32K_SKIP_PROBE=1 HEEV32K_WARM_REPEAT=1 \
    python scripts/heev_32768.py && { echo DONE; exit 0; }
  echo "run failed; backoff"
  sleep 240
done
echo GAVE_UP; exit 1
