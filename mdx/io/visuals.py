"""Before/after visualisation PNGs (ref pipeline/dicom_io.py:99-146).

Backend policy: these functions never force a matplotlib backend — the CLI
sets Agg itself for ``--no-show`` (main.py), servers run headless (Agg is
matplotlib's no-DISPLAY default), and an interactive CLI run keeps its GUI
backend so ``plt.show()`` after the pipeline displays the figures
(reference behaviour, ref main.py:123-128).  Figures are closed only on
non-interactive backends; on GUI backends they stay open for show().
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _maybe_close(plt, fig) -> None:
    import matplotlib

    if "agg" in matplotlib.get_backend().lower():
        plt.close(fig)


def save_visuals(original: np.ndarray, enhanced: np.ndarray,
                 out_dir: str, base_name: str) -> Dict[str, str]:
    """Save a side-by-side before/after comparison PNG."""
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    figure_path = os.path.join(out_dir, f"{base_name}_before_after.png")
    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    for ax, img, title in ((axes[0], original, "Before"),
                           (axes[1], enhanced, "After")):
        ax.imshow(np.asarray(img), cmap="gray")
        ax.set_title(title)
        ax.axis("off")
    plt.tight_layout()
    fig.savefig(figure_path, dpi=150)
    _maybe_close(plt, fig)
    return {"before_after": figure_path}


def save_single_image(image: np.ndarray, out_path: str, title: str = "") -> str:
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.imshow(np.asarray(image), cmap="gray")
    if title:
        ax.set_title(title)
    ax.axis("off")
    plt.tight_layout()
    fig.savefig(out_path, dpi=150)
    _maybe_close(plt, fig)
    return out_path
