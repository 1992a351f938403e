"""Registration-quality / FWHM plots and photometry light curves.

Reference: src/gui/plot.c (quality and FWHM curves via the vendored
kplot library) and the gnuplot light-curve export (src/gui/gnuplot_i/).
Here: plain ``.dat`` exports (gnuplot-compatible, like the reference's
light-curve files) plus optional PNG rendering through matplotlib when
available.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def registration_curve(seq, layer: int = 0):
    """(frame index, quality, fwhm) rows for plotting (plot.c data)."""
    reg = seq.regparam.get(layer) or []
    rows = []
    for i, r in enumerate(reg):
        rows.append((i, r.quality, r.fwhm))
    return np.asarray(rows, dtype=np.float64).reshape(-1, 3)


def export_registration_dat(seq, path: str, layer: int = 0) -> str:
    rows = registration_curve(seq, layer)
    with open(path, "w") as f:
        f.write("# frame quality fwhm\n")
        for i, q, fw in rows:
            f.write(f"{int(i)} {q:g} {fw:g}\n")
    return path


def light_curve(results, use_julian: bool = False):
    """(index_or_time, mag, err) from seqpsf photometry results
    (the light-curve data exported through gnuplot in the reference)."""
    rows = []
    for r in results:
        if not r.ok or r.photometry is None:
            continue
        rows.append((r.image_index, r.photometry.mag, r.photometry.s_mag))
    return np.asarray(rows, dtype=np.float64).reshape(-1, 3)


def export_light_curve_dat(results, path: str) -> str:
    rows = light_curve(results)
    with open(path, "w") as f:
        f.write("# frame magnitude error\n")
        for i, m, e in rows:
            f.write(f"{int(i)} {m:g} {e:g}\n")
    return path


def plot_png(rows: np.ndarray, path: str, *, ylabel: str = "quality",
             column: int = 1) -> Optional[str]:
    """Render a curve to PNG via matplotlib (None if unavailable)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(rows[:, 0], rows[:, column], "o-")
    ax.set_xlabel("frame")
    ax.set_ylabel(ylabel)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


__all__ = ["registration_curve", "export_registration_dat", "light_curve",
           "export_light_curve_dat", "plot_png"]
