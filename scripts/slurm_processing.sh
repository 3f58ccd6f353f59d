#!/bin/bash
# SLURM launcher for multi-node processing (reference equivalent:
# scripts/savio_processing.sh). Each task processes a disjoint slice of
# the raw series (parallel/multihost.split_series_for_host) and writes
# uniquely-numbered output series — no inter-node communication needed.
#
#SBATCH --job-name=detprocess-tpu
#SBATCH --ntasks=4
#SBATCH --time=12:00:00

RAW_PATH=${1:?usage: sbatch slurm_processing.sh RAW_PATH CONFIG OUT}
CONFIG=${2:?config yaml required}
OUT=${3:?output path required}

srun python "$(dirname "$0")/process_distributed.py" \
    --raw_path "$RAW_PATH" --processing_setup "$CONFIG" \
    --output_group_path "$OUT" --enable-trig --enable-feature
