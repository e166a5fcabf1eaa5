"""End-to-end pretraining loop (npe_pfn_tpu.pretrain.train.train).

Drives the full loop — not just train_step — across log/val/checkpoint
boundaries. Guards the device-side loss accumulation (the host syncs only at
the log cadence; a per-step float(loss) cost ~7% of step time on the remote
runtime) and the resume path.
"""

import json

import jax

from npe_pfn_tpu.models.config import TabICAConfig
from npe_pfn_tpu.pretrain import prior, train


def _tiny():
    cfg = TabICAConfig(d_model=32, num_heads=2, num_layers=2, max_features=8,
                       num_bars=32, dtype="float32")
    tcfg = train.TrainConfig(num_datasets=2, warmup_steps=2, max_steps=4,
                             lr=1e-3, log_every=2, val_every=4, ckpt_every=4)
    pcfg = prior.PriorConfig(num_features=8, num_ctx=32, num_qry=16,
                             max_active_features=6, hidden=16)
    return cfg, tcfg, pcfg


def test_train_loop_logs_and_resumes(tmp_path):
    cfg, tcfg, pcfg = _tiny()
    ckpt = str(tmp_path / "m.npz")
    log = str(tmp_path / "log.jsonl")

    model = train.train(cfg, tcfg, pcfg, ckpt_path=ckpt, log_path=log)
    assert model.params is not None

    recs = [json.loads(l) for l in open(log)]
    losses = [r for r in recs if "loss" in r]
    vals = [r for r in recs if "val_nll" in r]
    assert [r["step"] for r in losses] == [2, 4]
    # Device-accumulated window means must be finite floats, not arrays.
    assert all(isinstance(r["loss"], float) and r["loss"] == r["loss"]
               for r in losses)
    assert vals and vals[0]["step"] == 4

    # Resume: a second call continues from the saved state (max_steps
    # already reached -> no new steps, loop exits cleanly with the
    # accumulator empty).
    import dataclasses
    tcfg2 = dataclasses.replace(tcfg, max_steps=6)
    train.train(cfg, tcfg2, pcfg, ckpt_path=ckpt, log_path=log)
    recs = [json.loads(l) for l in open(log)]
    assert [r["step"] for r in recs if "loss" in r] == [2, 4, 6]
