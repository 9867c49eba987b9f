#!/bin/bash
# Full round-3 measurement batch (run when the TPU tunnel is healthy).
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
set -x
echo "=== 1. fast-path validation + headline ==="
bash scripts_dev/tpu_batch1.sh 2>&1
echo "=== 2. decode sweep 480p (norm fusion on) ==="
timeout 3000 python -u scripts_dev/drive_vae_decode.py 480p
echo "=== 3. decode 720p (chunk auto-ish: 4) ==="
TDX_DECODE_CHUNKS=4 timeout 3000 python -u scripts_dev/drive_vae_decode.py 720p
echo "=== 4. sCM JVP + full step at 81f ==="
timeout 3600 python -u scripts_dev/measure_jvp_81f.py 81
