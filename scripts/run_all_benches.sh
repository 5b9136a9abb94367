#!/bin/bash
# ONE clean sequential TPU session — never run anything else concurrently
# (single host CPU + tunneled chip: contention corrupts every number).
set -x
cd /root/repo
python bench.py                      2>&1
python scripts/bench_sparse_dc.py    2>&1
python scripts/bench_ensemble_e2e.py 2>&1
echo ALL-BENCHES-DONE
