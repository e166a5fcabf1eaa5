#!/usr/bin/env python
"""Hardware smoke for the Pallas flash kernels (VERDICT r3 item 6).

Interpret mode cannot check Mosaic tiling (two tiling bugs reached the
real chip in round 3), so every kernel output/mask layout must run on
hardware once before anything depends on it. This covers the matrix that
has never been chip-proven together:

  plain kernel x {shared [Lk], per-batch [B, Lk]} masks x {2048, 4096} ctx
  lse kernel   x {shared, per-batch}                      (post-dedup)
  trainable VJP (grad through the Pallas fwd + XLA bwd)

Each cell asserts numerical agreement with the pure-jnp reference and
writes a verdict to results/flash_smoke_tpu.json. Run on the real TPU
(default env; pays the axon claim tax once).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from npe_pfn_tpu.ops import flash_attention as fa

    assert jax.default_backend() == "tpu", (
        "smoke must run on the real chip; interpret/CPU equality is "
        "already covered by tests/test_flash_attention.py"
    )

    results = {"backend": jax.default_backend(), "cells": [], "ok": True}
    H, HD = 2, 128
    B = 6  # 3 column tokens x 2 ensemble members, say
    LQ = 256

    def run_cell(name, fn, ref_fn, tol=2e-2):
        t0 = time.time()
        try:
            out = np.asarray(fn())
            ref = np.asarray(ref_fn())
            err = float(np.max(np.abs(out - ref)))
            ok = bool(np.isfinite(out).all() and err < tol)
            cell = {"name": name, "ok": ok, "max_err": err,
                    "secs": round(time.time() - t0, 1)}
        except Exception as e:  # noqa: BLE001 - smoke must report, not die
            cell = {"name": name, "ok": False, "error": repr(e),
                    "secs": round(time.time() - t0, 1)}
        results["cells"].append(cell)
        results["ok"] = results["ok"] and cell["ok"]
        print(json.dumps(cell), flush=True)

    for lk in (2048, 4096):
        key = jax.random.PRNGKey(lk)
        kq, kk, kv, km = jax.random.split(key, 4)
        q = jax.random.normal(kq, (B, LQ, H, HD), jnp.bfloat16)
        k = jax.random.normal(kk, (B, lk, H, HD), jnp.bfloat16)
        v = jax.random.normal(kv, (B, lk, H, HD), jnp.bfloat16)
        shared = (jnp.arange(lk) < lk - 100)
        perb = jax.random.bernoulli(km, 0.8, (B, lk))
        perb = perb.at[0].set(jnp.zeros(lk, bool))  # empty-context row

        for mname, mask in (("shared", shared), ("per_batch", perb)):
            run_cell(
                f"plain/{mname}/lk{lk}",
                lambda q=q, k=k, v=v, m=mask: fa.flash_row_attention(q, k, v, m),
                lambda q=q, k=k, v=v, m=mask: fa.reference_row_attention(
                    q, v=v, k=k, kv_mask=m
                ) * fa._any_valid_gate(m, q.dtype),
            )
            run_cell(
                f"lse/{mname}/lk{lk}",
                lambda q=q, k=k, v=v, m=mask: fa._flash_fwd_lse(q, k, v, m)[0],
                lambda q=q, k=k, v=v, m=mask: fa.reference_row_attention(
                    q, v=v, k=k, kv_mask=m
                ) * fa._any_valid_gate(m, q.dtype),
            )

    # trainable VJP: grad wrt q through Pallas fwd + chunked XLA bwd
    key = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, LQ, H, HD), jnp.float32)
    k = jax.random.normal(kk, (B, 2048, H, HD), jnp.float32)
    v = jax.random.normal(kv, (B, 2048, H, HD), jnp.float32)
    mask = (jnp.arange(2048) < 1900)

    def loss_flash(q):
        return jnp.sum(fa.flash_row_attention_trainable(q, k, v, mask) ** 2)

    def loss_ref(q):
        return jnp.sum(
            (fa.reference_row_attention(q, k, v, mask)
             * fa._any_valid_gate(mask, q.dtype)) ** 2
        )

    run_cell(
        "trainable_vjp/shared/lk2048",
        lambda: jax.grad(loss_flash)(q),
        lambda: jax.grad(loss_ref)(q),
        tol=5e-2,
    )

    os.makedirs("results", exist_ok=True)
    with open("results/flash_smoke_tpu.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"ok": results["ok"]}))
    sys.exit(0 if results["ok"] else 1)


if __name__ == "__main__":
    main()
