#!/usr/bin/env bash
# Benchmark/experiment launcher with log + result rotation.
#
# Equivalent of the reference's cluster launcher (reference run_mpcgpu.sh:
# 1-120: Slurm batch wrapper, GPU memory sampling, result backup rotation)
# for a single-host TPU VM: rotates previous results, runs the experiment
# suites and the headline benchmark, and archives everything with logs.
set -euo pipefail
cd "$(dirname "$0")/.."

STAMP=$(date +%Y%m%d_%H%M%S)
OUT="results/run_${STAMP}"
mkdir -p "${OUT}"

# rotate any previous unarchived results (run_mpcgpu.sh backup rotation)
if [ -d results/latest ]; then
  mv results/latest "results/backup_${STAMP}"
fi

{
  echo "== device memory: idle probe =="
  python experiments/vram_idle.py --out "${OUT}/vram_idle.json" || true

  echo "== bench.py (headline) =="
  python bench.py | tee "${OUT}/bench.json"

  echo "== experiments: preconditioning ablation (memory-sampled) =="
  python experiments/01_precond_ablation.py --knots 16 32 64 \
    --max-timesteps 64 --sample-memory || true

  echo "== experiments: long running w/ LDL oracle =="
  python experiments/02_long_running.py --knots 32 64 \
    --max-timesteps 64 || true

  echo "== device memory: N=512 load probe =="
  python experiments/vram_load_512.py --out "${OUT}/vram_load_512.json" || true
} 2>&1 | tee "${OUT}/log.txt"

cp -r results/01a_preconditioned results/01b_no_preconditioner \
      results/02_long_running "${OUT}/" 2>/dev/null || true
ln -sfn "run_${STAMP}" results/latest
echo "archived to ${OUT}"
