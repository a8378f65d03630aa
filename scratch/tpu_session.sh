#!/bin/bash
# One-shot serialized TPU measurement session for round 3.
# Run ONLY when the tunnel probe succeeds; stages run serially in separate
# processes (clean exits don't wedge the tunnel).  Log: scratch/tpu_session.log
# ORDER: headline bench evidence FIRST — if the recovery window is short,
# BENCH_r03-grade numbers + bench_history.jsonl must not be lost to A/B
# compiles.
cd /root/repo
LOG=scratch/tpu_session.log
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "probe"
timeout 570 python -c "
import jax, numpy as np
x = jax.numpy.ones((128,128)); y = np.asarray(x @ x)
assert y[0,0] == 128.0; print('PROBE_OK')
" >> "$LOG" 2>&1 || { say "probe failed; aborting"; exit 3; }

say "bench (headline evidence)"
timeout 3600 python bench.py >> "$LOG" 2>&1
say "bench rc=$?"

say "mosaic smoke tests"
timeout 1800 python -m pytest tests/test_tpu_smoke.py -q -p no:cacheprovider >> "$LOG" 2>&1
say "smoke rc=$?"

say "profile per-ray sweep"
timeout 1800 python scratch/profile_sweep.py 0 32768 >> "$LOG" 2>&1
say "profile rc=$?"

say "share/extract A/B frames"
timeout 5400 python scratch/share_bench.py >> "$LOG" 2>&1
say "ab rc=$?"
say "done"
