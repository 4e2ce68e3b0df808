"""Shared helpers for the demo scripts (run from the repo root:
``python demo/step_fct.py``).  Each demo mirrors one reference notebook
configuration (dgpsi/demo/*.ipynb) and saves its figure to demo/figures/."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

FIGDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "figures")
os.makedirs(FIGDIR, exist_ok=True)


def save(name):
    out = os.path.join(FIGDIR, name)
    plt.savefig(out, dpi=120, bbox_inches="tight")
    print(f"saved {out}")
    plt.close("all")


def band(z, mu, var, color="g"):
    s = (var ** 0.5).flatten()
    z, mu = z.flatten(), mu.flatten()
    plt.plot(z, mu, color="r", lw=1)
    plt.plot(z, mu + 2 * s, "--", color=color, lw=1)
    plt.plot(z, mu - 2 * s, "--", color=color, lw=1)
