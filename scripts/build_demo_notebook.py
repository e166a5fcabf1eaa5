#!/usr/bin/env python
"""Build + execute notebooks/demo.ipynb (the reference ships demo.ipynb with
saved outputs; this constructs ours programmatically and executes it)."""

import os

import nbformat as nbf
from nbclient import NotebookClient

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

CELLS = [
    ("markdown", """\
# NPE-PFN on TPU: training-free posterior inference

This walkthrough mirrors the reference's `demo.ipynb`: simulate from a prior,
hand the `(θ, x)` pairs to the pretrained tabular in-context transformer as
*context*, and sample the posterior immediately — **no training**.
"""),
    ("code", """\
import jax, jax.numpy as jnp, numpy as np
import matplotlib.pyplot as plt
import npe_pfn_tpu as npt

task = npt.tasks.get_task("two_moons")
theta_o = jnp.array([0.3, -0.4])
x_o = task.simulator(jax.random.PRNGKey(99), theta_o)
print("true θ:", theta_o, " observed x:", x_o)"""),
    ("markdown", "## 1. Simulate (θ, x) pairs on device"),
    ("code", """\
theta, x = task.simulate(jax.random.PRNGKey(0), 1000)
fig, ax = plt.subplots(1, 2, figsize=(8, 3))
ax[0].scatter(*np.asarray(theta).T, s=2); ax[0].set_title("prior θ")
ax[1].scatter(*np.asarray(x).T, s=2); ax[1].plot(*np.asarray(x_o), "r*", ms=12)
ax[1].set_title("simulated x (red: x_o)"); plt.show()"""),
    ("markdown", "## 2. Bind context and sample the posterior (no training)"),
    ("code", """\
est = npt.NPEPFN(prior=task.prior, filter_context_size=256, qry_chunk=256)
est.append_simulations(theta, x)
post = est.sample(512, x_o, rng=jax.random.PRNGKey(1))
gt = task.posterior_sampler(jax.random.PRNGKey(2), x_o, 512)  # exact reference
fig, ax = plt.subplots(1, 2, figsize=(8, 3.5), sharex=True, sharey=True)
ax[0].scatter(*np.asarray(post).T, s=3, alpha=0.4); ax[0].set_title("NPE-PFN posterior")
ax[1].scatter(*np.asarray(gt).T, s=3, alpha=0.4, color="g"); ax[1].set_title("exact posterior")
for a in ax: a.plot(*np.asarray(theta_o), "r*", ms=12); a.set_xlim(-1,1); a.set_ylim(-1,1)
plt.show()"""),
    ("markdown", "## 3. Quantify: C2ST vs the exact posterior"),
    ("code", """\
from npe_pfn_tpu.eval import metrics
c = float(metrics.c2st(jax.random.PRNGKey(3), post, gt))
print(f"C2ST vs exact posterior: {c:.3f}  (0.5 = indistinguishable)")"""),
    ("markdown", """\
## 3b. The headline comparison: trained NPE vs zero-training NPE-PFN

The reference's demo (cell 4) trains a classical sbi flow for ~214 epochs to
reach its posterior; NPE-PFN needs **no training at all**. Same comparison
here with the framework's own conditional coupling flow (`FlowNPE`), trained
by maximum likelihood on the *same* 1000 simulations the estimator consumed
as context."""),
    ("code", """\
from npe_pfn_tpu.baselines import FlowNPE
flow = FlowNPE(dim_theta=2, dim_x=2, seed=0)
epochs = flow.fit(theta, x)
post_flow = flow.sample(512, x_o, rng=jax.random.PRNGKey(11))
c_flow = float(metrics.c2st(jax.random.PRNGKey(3), jnp.asarray(post_flow), gt))
print(f"trained flow NPE : {epochs} training epochs -> C2ST {c_flow:.3f}")
print(f"NPE-PFN          : 0 training epochs  -> C2ST {c:.3f}")
fig, ax = plt.subplots(1, 2, figsize=(8, 3.5), sharex=True, sharey=True)
ax[0].scatter(*np.asarray(post_flow).T, s=3, alpha=0.4, color="tab:orange")
ax[0].set_title(f"flow NPE ({epochs} epochs)")
ax[1].scatter(*np.asarray(post).T, s=3, alpha=0.4)
ax[1].set_title("NPE-PFN (no training)")
for a in ax: a.plot(*np.asarray(theta_o), "r*", ms=12); a.set_xlim(-1,1); a.set_ylim(-1,1)
plt.show()"""),
    ("markdown", "## 4. Density evaluation (ratio-based, classifier-cached)"),
    ("code", """\
lp = est.log_prob(post[:64], x_o, mode="autoregressive")
print("autoregressive log q(θ|x):", float(lp.mean()))"""),
    ("markdown", """\
## 5. Quantile target transform (TabPFN-style preprocessing variant)

`target_transform="quantile"` maps each θ-dimension's context values to
normal scores before discretization — adaptive bar resolution for thin
posterior structure, with exact Jacobians on log-probs."""),
    ("code", """\
est_q = npt.NPEPFN(prior=task.prior, filter_context_size=256, qry_chunk=256,
                   target_transform="quantile")
est_q.append_simulations(theta, x)
post_q = est_q.sample(512, x_o, rng=jax.random.PRNGKey(6))
c_q = float(metrics.c2st(jax.random.PRNGKey(3), post_q, gt))
print(f"C2ST (quantile transform): {c_q:.3f}  vs zscore: {c:.3f}")"""),
    ("markdown", """\
## 6. Task registry: 12 simulators, 8 with ground-truth posteriors"""),
    ("code", """\
print(npt.tasks.list_tasks())
gm = npt.tasks.get_task("gaussian_mixture")
th_gm, x_gm = gm.simulate(jax.random.PRNGKey(7), 2000)
est_gm = npt.NPEPFN(prior=gm.prior, filter_context_size=256, qry_chunk=256)
est_gm.append_simulations(th_gm, x_gm)
post_gm = est_gm.sample(256, x_gm[0], rng=jax.random.PRNGKey(8))
gt_gm = gm.posterior_sampler(jax.random.PRNGKey(9), x_gm[0], 256)
print("gaussian_mixture C2ST:",
      round(float(metrics.c2st(jax.random.PRNGKey(10), post_gm, gt_gm)), 3))"""),
    ("markdown", "## 7. Sequential truncated inference (TSNPE-PFN)"),
    ("code", """\
est_seq = npt.run_tsnpe(task.simulator, task.prior, x_o,
                        num_rounds=2, num_simulations=1000,
                        rng=jax.random.PRNGKey(4),
                        filter_context_size=256, qry_chunk=256,
                        num_samples_to_estimate_support=512,
                        support_batch_size=4096)
post_seq = est_seq.sample(512, x_o, rng=jax.random.PRNGKey(5))
print("TSNPE posterior mean:", np.asarray(post_seq.mean(0)))"""),
]


def main():
    nb = nbf.v4.new_notebook()
    for kind, src in CELLS:
        nb.cells.append(
            nbf.v4.new_markdown_cell(src) if kind == "markdown"
            else nbf.v4.new_code_cell(src)
        )
    client = NotebookClient(nb, timeout=1800, kernel_name="python3")
    client.execute()
    out = os.path.join(ROOT, "notebooks", "demo.ipynb")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        nbf.write(nb, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
