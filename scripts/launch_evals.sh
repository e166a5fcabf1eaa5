#!/bin/bash
# Parallel eval launcher (reference: scripts/launch_batched_eval.sh submits
# one OAR job per task, launch_batched_eval.sh:24-32; here: one process per
# task, embarrassingly parallel — same topology without the scheduler).
#
# Usage: scripts/launch_evals.sh [tasks...]
set -u
cd "$(dirname "$0")/.."
TASKS=${@:-"two_moons gaussian_linear slcp lotka_volterra sir pendulum"}
mkdir -p results/logs
for task in $TASKS; do
    echo "launching eval: $task"
    nohup python scripts/evaluate_tasks.py --tasks "$task" --out results \
        > "results/logs/${task}.log" 2>&1 &
done
wait
python scripts/plot_results.py --results results --out results/plots
