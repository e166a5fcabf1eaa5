#!/usr/bin/env python
"""Build a stochastic-weight-average checkpoint from training snapshots.

Averages the flat-param .npz files collected by
``scripts/snapshot_checkpoints.sh`` (equal weights — SWA; Izmailov et al.
2018) and writes a serveable checkpoint alongside the source run's config
JSON, so it can enter the quality gate as one more candidate:

    python scripts/swa_checkpoint.py \
        --snapshots 'checkpoints/snapshots/tabica_v4_s*.npz' \
        --config checkpoints/tabica_v4.npz.json \
        --out checkpoints/tabica_v4_swa.npz [--last 4]

Pure host-side numpy — never claims the TPU. Averaging is only sound
within one optimization trajectory (same init/run); do not mix runs.
"""

import argparse
import glob
import json
import re
import shutil


def step_of(path: str) -> int:
    m = re.search(r"_s(\d+)\.npz$", path)
    return int(m.group(1)) if m else -1


def main():
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshots", default="checkpoints/snapshots/tabica_v4_s*.npz")
    ap.add_argument("--config", default="checkpoints/tabica_v4.npz.json")
    ap.add_argument("--out", default="checkpoints/tabica_v4_swa.npz")
    ap.add_argument("--last", type=int, default=4,
                    help="average the newest N snapshots (by step)")
    args = ap.parse_args()

    paths = sorted(glob.glob(args.snapshots), key=step_of)[-args.last:]
    if len(paths) < 2:
        raise SystemExit(f"need >=2 snapshots, found {len(paths)}: {paths}")
    steps = [step_of(p) for p in paths]

    acc = None
    keys = None
    for p in paths:
        z = np.load(p)
        if keys is None:
            keys = sorted(z.keys())
            acc = {k: z[k].astype(np.float64) for k in keys}
        else:
            assert sorted(z.keys()) == keys, f"key mismatch in {p}"
            for k in keys:
                acc[k] += z[k].astype(np.float64)
    out = {k: (acc[k] / len(paths)).astype(np.float32) for k in keys}
    np.savez(args.out, **out)
    shutil.copy(args.config, args.out + ".json")
    meta = {"swa_of": paths, "steps": steps}
    with open(args.out + ".swa.json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"SWA over steps {steps} -> {args.out}")


if __name__ == "__main__":
    main()
