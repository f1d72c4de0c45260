#!/bin/bash
# Round-5 chip measurement queue — run when the TPU tunnel recovers.
# Each stage logs to /tmp/chip_r5/ and failures don't block later stages.
# Stages are ordered by information-per-minute.
set -u
OUT=/tmp/chip_r5
mkdir -p $OUT
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date)) ===" | tee -a $OUT/driver.log
  timeout "$tmo" "$@" >$OUT/$name.log 2>&1
  echo "=== $name exit=$? ($(date)) ===" | tee -a $OUT/driver.log
}

# 0. is the chip actually back?
timeout 300 python -c "import jax; print(jax.devices())" || exit 3

# 1. sequence-family slice-gather A/B (VERDICT r4 #2 'done' criterion):
#    DIN steady rate with and without the vocab-slice gather
run seq_slice_on  3000 python scripts/bench_seq_amazon.py --models DIN --seq-slice 1
run seq_slice_off 3000 python scripts/bench_seq_amazon.py --models DIN --seq-slice 0
# widen to the full family at the winning setting
run seq_family    5400 python scripts/bench_seq_amazon.py --models DIEN,BST,TransAct --seq-slice 1

# 2. flagship re-validation on the round-5 code (steady + AUC)
run criteo_main   5400 python scripts/run_criteo_scale.py --phase train --loader device --epochs 2

# 3. full-scale warm tuner sweeps (the round-5 quality frontier)
run tuner_dcnv2  14000 python run_param_tuner.py --config configs/tuner/tuner_criteo_full_dcnv2.yaml --inprocess
run tuner_xdeepfm 7200 python run_param_tuner.py --config configs/tuner/tuner_criteo_full_xdeepfm.yaml --inprocess
python scripts/tuner_leaderboard.py configs/tuner/tuner_criteo_full_dcnv2 \
    configs/tuner/tuner_criteo_full_xdeepfm > $OUT/leaderboard.md 2>&1

# 4. crash-resume drill at full scale
run drill         7200 python scripts/drill_resume.py --phase all

# 5. BARS dress rehearsal train phase (1M-row exact-dialect rebuild)
run bars_train    5400 python scripts/run_bars_criteo.py --raw /tmp/ctr_scale/bars_raw --out /tmp/ctr_scale/bars_x1 --phase train

# 6. headline bench
run bench         3600 python bench.py

echo "ALL DONE $(date)" | tee -a $OUT/driver.log
