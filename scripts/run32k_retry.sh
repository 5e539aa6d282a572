#!/bin/bash
# Probe-gated retry loop for the 32k HEEV+SBR measurement (co-tenant
# waves on the shared worker make one-shot runs hopeless; CLAUDE.md r4).
cd "$(dirname "$0")/.."
for i in $(seq 1 40); do
  echo "=== attempt $i $(date) ==="
  # HBM canary: ~8.6 GB must fit before we bother launching
  timeout 1200 python - <<'PY'
import jax, jax.numpy as jnp
y = jnp.zeros((2, 32768, 32768))
y.ravel()[0].item()
print("canary ok")
PY
  if [ $? -ne 0 ]; then echo "canary failed; backoff"; sleep 240; continue; fi
  timeout 5400 env HEEV32K_SBR=${HEEV32K_SBR:-512} HEEV32K_SKIP_PROBE=1 HEEV32K_WARM_REPEAT=1 \
    python scripts/heev_32768.py && { echo DONE; exit 0; }
  echo "run failed; backoff"
  sleep 240
done
echo GAVE_UP; exit 1
