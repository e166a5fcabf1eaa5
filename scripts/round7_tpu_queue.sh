#!/bin/bash
# Final-round measurement queue (VERDICT r4 items 1,2,4,5,6,8).
#
# Serial TPU stages, one commit per stage, watchdogs where the remote-compile
# drop failure mode applies (CLAUDE.md). Order: temperature calibration first
# (fast; decides the shipped DEFAULT), then the headline budget-matched
# refine-quality comparison ON that final DEFAULT, then the featq eval delta,
# the TSNPE rounds diagnosis, the headline bench (+roofline), and the
# row-pool step-time A/B.
#
#   scripts/round7_tpu_queue.sh
set -u
cd "$(dirname "$0")/.."

echo $$ > ${QUEUE_PIDFILE:-/tmp/queue.pid}
mkdir -p results/round7

commit_results() {
    git add results checkpoints notebooks 2>/dev/null
    git diff --cached --quiet 2>/dev/null || git commit -q -m "$1

No-Verification-Needed: measurement artifacts only"
}

BASE=$(cat checkpoints/DEFAULT 2>/dev/null || echo tabica_v6_best.npz)
CAL="${BASE%.npz}_cal.npz"
echo "[queue] base DEFAULT: $BASE"

# ---- 1. Post-hoc temperature calibration (VERDICT item 4) ----------------
# Fit tau on held-out synthetic tasks, bake a calibrated checkpoint, SBC +
# quality-gate it against the base, flip DEFAULT iff it wins.
[ -f results/round7/temperature_fit.json ] || \
    timeout 2400 python scripts/fit_temperature.py --num_datasets 64 \
        --bake "checkpoints/$CAL" --out results/round7/temperature_fit.json
for spec in two_moons:2 gaussian_linear:5; do
    task=${spec%%:*}; dim=${spec##*:}
    [ -s "results/round7/sbc_${task}_base.log" ] || \
        timeout 2700 python scripts/calibration_check.py --task "$task" --dim "$dim" \
            > "results/round7/sbc_${task}_base.log" 2>&1 || true
    [ -s "results/round7/sbc_${task}_cal.log" ] || \
        NPE_PFN_TPU_CHECKPOINT="checkpoints/$CAL" \
        timeout 2700 python scripts/calibration_check.py --task "$task" --dim "$dim" \
            > "results/round7/sbc_${task}_cal.log" 2>&1 || true
done
[ -s results/round7/quality_base.log ] || \
    timeout 2400 python scripts/quality_check.py \
        > results/round7/quality_base.log 2>&1 || true
[ -s results/round7/quality_cal.log ] || \
    NPE_PFN_TPU_CHECKPOINT="checkpoints/$CAL" \
    timeout 2400 python scripts/quality_check.py \
        > results/round7/quality_cal.log 2>&1 || true

python - "$BASE" "$CAL" <<'EOF'
import json, os, sys
base_name, cal_name = sys.argv[1], sys.argv[2]

def last_json(path):
    try:
        rows = [l for l in open(path) if l.strip().startswith("{")]
        return json.loads(rows[-1]) if rows else None
    except Exception:
        return None

gate = {"base": base_name, "cal": cal_name, "flip": False, "reasons": []}
ok = os.path.exists(os.path.join("checkpoints", cal_name))
if not ok:
    gate["reasons"].append("calibrated checkpoint missing")
sbc_votes = []
for task in ("two_moons", "gaussian_linear"):
    b = last_json(f"results/round7/sbc_{task}_base.log")
    c = last_json(f"results/round7/sbc_{task}_cal.log")
    if not (b and c):
        ok = False
        gate["reasons"].append(f"sbc logs missing for {task}")
        continue
    cov_err = lambda r: sum(abs(v - 0.9) for v in r["coverage_90"]) / len(r["coverage_90"])
    win = (c["frac_dims_calibrated"] >= b["frac_dims_calibrated"]
           and cov_err(c) <= cov_err(b) + 0.005)
    sbc_votes.append(win)
    gate[f"sbc_{task}"] = {
        "base": {"frac": b["frac_dims_calibrated"], "cov": b["coverage_90"]},
        "cal": {"frac": c["frac_dims_calibrated"], "cov": c["coverage_90"]},
        "win": win,
    }
qb = last_json("results/round7/quality_base.log")
qc = last_json("results/round7/quality_cal.log")
if qb and qc and "summary" in qb and "summary" in qc:
    qb, qc = qb["summary"], qc["summary"]
    qual_ok = (qc["gaussian_linear"]["c2st"] <= qb["gaussian_linear"]["c2st"] + 0.02
               and qc["two_moons"]["predictive_gain"] >= 0.9 * qb["two_moons"]["predictive_gain"]
               and qc["two_moons"]["mode_balance"] >= qb["two_moons"]["mode_balance"] - 0.05)
    gate["quality"] = {"base": qb, "cal": qc, "ok": qual_ok}
else:
    qual_ok = False
    gate["reasons"].append("quality logs missing")
gate["flip"] = bool(ok and sbc_votes and all(sbc_votes) and qual_ok)
if gate["flip"]:
    with open("checkpoints/DEFAULT", "w") as f:
        f.write(cal_name + "\n")
    gate["reasons"].append("calibrated checkpoint wins SBC on both tasks without quality regression")
with open("results/round7/temperature_gate.json", "w") as f:
    json.dump(gate, f, indent=2)
print("[queue] temperature gate:", json.dumps({k: gate[k] for k in ("flip", "reasons")}))
EOF
commit_results "Temperature calibration: fit, SBC/quality gate vs base"

WINNER=$(cat checkpoints/DEFAULT 2>/dev/null || echo "$BASE")
echo "[queue] serving DEFAULT for remaining stages: $WINNER"

# ---- 2. Headline budget-matched refine-quality comparison (item 1) -------
bash scripts/run_with_watchdog.sh /tmp/refineq.log 2400 21600 -- \
    python scripts/refine_quality.py \
    --tasks two_moons slcp gaussian_mixture \
    --budget 10000 --ctx_refined 2000 --seeds 0 1 2 --n_obs 8 \
    --filter_context_size 2048 \
    --out results/round7/refine_quality.json || true
commit_results "Budget-matched refine-quality comparison at 10k sims (headline)"

# ---- 3. Feature-side quantile-preprocessing eval delta (item 5) ----------
bash scripts/run_with_watchdog.sh /tmp/featq.log 2400 14400 -- \
    python scripts/evaluate_tasks.py \
    --tasks lotka_volterra sir pendulum \
    --feature_transform quantile \
    --num_cal 200 1000 --seeds 0 1 2 --num_test 1000 \
    --out results/round7_featq || true
commit_results "Feature-side quantile preprocessing: eval delta on skewed simulators"

# ---- 4. TSNPE 4-round regression diagnosis (item 8) -----------------------
bash scripts/run_with_watchdog.sh /tmp/tsnpediag.log 2400 10800 -- \
    python scripts/tsnpe_diagnose.py \
    --out results/round7/tsnpe_rounds_diagnosis.json || true
commit_results "TSNPE rounds-regression diagnosis (per-round support diagnostics + FNR)"

# ---- 5. Headline bench on the final DEFAULT (+roofline) (item 6) ---------
timeout 3600 python bench.py --roofline --out results/bench_round7_ctx2048.json || true
commit_results "Round-7 headline bench at the shipped 2048-row context (+roofline)"
timeout 2400 python bench.py --filter_context 512 --num_sims 1000 \
    --out results/bench_round7_ctx512.json || true
commit_results "Round-7 continuity bench at 512-row context"

# ---- 6. Row-pool step-time A/B at the v6 shape (item 2) -------------------
for slots in 0 8; do
    [ -f "results/round7/train_step_pool_${slots}.json" ] || \
        timeout 3600 python scripts/profile_train_step.py \
            --d_model 256 --num_heads 2 --num_layers 8 --num_ctx 768 \
            --flash off --scores_dtype bfloat16 --row_pool_slots "$slots" \
            --out "results/round7/train_step_pool_${slots}.json" || true
done
python - <<'EOF'
import json, os
merged = {}
for slots in (0, 8):
    p = f"results/round7/train_step_pool_{slots}.json"
    if os.path.exists(p):
        merged[f"row_pool_slots={slots}"] = json.load(open(p))
if merged:
    json.dump(merged, open("results/train_step_pool_ab.json", "w"), indent=2)
    print("[queue] pool A/B:", {k: v for k, v in merged.items()})
EOF
commit_results "Row-pool step-time A/B at the v6 shape (HBM-lever measurement)"

echo "[queue] done"
