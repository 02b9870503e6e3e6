"""Greedy station-placement study (active learning) on synthetic NZ data.

Role parity with the reference's imported-but-unused deepsensor
active-learning surface (``nzdownscale/downscaler/validate.py:26-27``):
trains a small model, then asks "where should the next K stations go?" —
the exhaustive greedy search scores every candidate site in one batched
forward per placement (al/greedy.py) and each placement feeds back as
context for the next.

    python examples/station_placement.py [out_dir]
"""

import os
import sys

import numpy as np

from deepsensornz_tpu.data.synthetic import synthetic_bundle
from deepsensornz_tpu.pipeline.preprocess import PreprocessForDownscaling
from deepsensornz_tpu.pipeline.train import Train
from deepsensornz_tpu.pipeline.validate import Validate
from deepsensornz_tpu.al.greedy import GreedyAlgorithm


def main(out_dir="/tmp/station_placement"):
    tiny = os.environ.get("DEEPSENSORNZ_EXAMPLE_TINY") == "1"
    os.makedirs(out_dir, exist_ok=True)
    base, dem, stations = synthetic_bundle(
        variable="temperature", n_times=6 if tiny else 16, base_hw=(24, 24),
        dem_hw=(48, 48) if tiny else (96, 96), n_stations=16,
    )
    pre = PreprocessForDownscaling(variable="temperature")
    processed = pre.run_processing_sequence(
        dem, {"temperature": base}, stations,
        highres_factor=2, lowres_factor=4, include_time_of_year=True,
    )
    training = Train(processed)
    training.setup_task_loader(station_as_context="all", internal_density=32)
    training.initialise_model(unet_channels=(8, 8) if tiny else (16, 16),
                              likelihood="cnp", compute_dtype="float32")
    model_dir = os.path.join(out_dir, "model")
    training.train_model(n_epochs=1 if tiny else 5, batch_size=4, lr=1e-3,
                         model_dir=model_dir, verbose=False)

    v = Validate(model_dir)
    t0 = sorted(set(v.task_loader.target["time"]))[:1]
    task = v.task_loader(t0, seed_override=42)
    A = task.yt_aux.shape[-1]

    # candidate sites: a regular lattice over the normalised domain
    g = np.linspace(0.1, 0.9, 6)
    cands = np.stack(np.meshgrid(g, g), -1).reshape(-1, 2).astype(np.float32)
    rng = np.random.default_rng(0)
    cand_aux = rng.normal(0, 0.1, size=(len(cands), A)).astype(np.float32)

    alg = GreedyAlgorithm(v.run["model"], v.run["params"], mode="exhaustive")
    result = alg.run(task, cands, n_placements=2 if tiny else 5,
                     candidate_aux=cand_aux)
    print("placements (x1, x2):")
    for p, s in zip(result["placements"], result["acquisition_history"]):
        print(f"  ({p[0]:.3f}, {p[1]:.3f})  mean-std after: {s:.4f}")
    drop = result["acquisition_history"][0] - result["acquisition_history"][-1]
    print(f"acquisition (mean predictive std) dropped {drop:.4f} over 5 placements")

    # figure: existing stations, candidate lattice, chosen placements
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from deepsensornz_tpu import plot as dplot

    fig, ax = plt.subplots(figsize=(6, 6))
    dplot.plot_field(dem, ax=ax, title="greedy station placement", cmap="terrain")
    dp = v.run["data_processor"]
    ex = np.asarray(task.points[-1].x[0])
    m = np.asarray(task.points[-1].mask[0]) > 0
    ax.scatter(dp.unmap_x2(ex[m, 1]), dp.unmap_x1(ex[m, 0]), c="k", s=18,
               label="existing stations")
    ax.scatter(dp.unmap_x2(cands[:, 1]), dp.unmap_x1(cands[:, 0]), c="w",
               s=8, alpha=0.6, label="candidates")
    pl = result["placements"]
    ax.scatter(dp.unmap_x2(pl[:, 1]), dp.unmap_x1(pl[:, 0]), c="r", marker="*",
               s=180, label="placed")
    for i, p in enumerate(pl):
        ax.annotate(str(i + 1), (dp.unmap_x2(p[1]), dp.unmap_x1(p[0])),
                    color="r", fontsize=9, xytext=(4, 4),
                    textcoords="offset points")
    ax.legend(loc="lower right", fontsize=8)
    fig.savefig(os.path.join(out_dir, "placement.png"), dpi=110,
                bbox_inches="tight")
    print(f"figure written to {out_dir}/placement.png")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/station_placement"]))
