#!/bin/bash
# On-chip sweep of the sparse kernel's ring depth / gather group size.
# The sparse attention measured 598 ms/step vs a 189 ms HBM floor (r2);
# this sweeps the two knobs most likely to close exposed DMA latency.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
for nbuf in 4 6 8; do
  for hi in 8 12 16; do
    echo "=== NBUF=$nbuf GROUP_HI=$hi ==="
    TDX_SPARSE_NBUF=$nbuf TDX_SPARSE_GROUP_HI=$hi \
      timeout 1200 python -u scripts_dev/profile_components.py sparse 2>&1 | tail -3
  done
done
