"""Matlab-like figure API (host-side).

Parity: Figure/Figures, core/include/tsd/vue.hpp:483-830,
core/src/vue/figure.cc — the reference ships its own software rasterizer;
here the rendering backend is matplotlib (host-side by nature, SURVEY §2.7)
while preserving the API capabilities used throughout the library:
plot / plot_psd / plot_img / plot_iq, format strings, subplots, titles,
save-to-PNG.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

__all__ = ["Figure", "Figures", "plot_eye"]


_COLORS = {"b": "tab:blue", "g": "tab:green", "r": "tab:red",
           "m": "tab:purple", "c": "tab:cyan", "y": "tab:olive",
           "k": "black", "a": "gray", "w": "white"}


def _parse_fmt(fmt: str):
    """Parse the reference's format strings like 'b-o', 'r-', 'gs'
    (figure.cc format parsing)."""
    color = None
    line = "-"
    marker = None
    for c in fmt:
        if c in _COLORS:
            color = _COLORS[c]
        elif c in "-|:":
            line = {"-": "-", "|": "-", ":": ":"}[c]
        elif c in "os^vd*+x.":
            marker = c if c != "." else "."
    return color, line, marker


class Figure:
    """One axes with accumulated curves (parity: tsd::vue::Figure)."""

    def __init__(self, title: str = ""):
        self._title = title
        self._ops: List = []
        self._xlabel = ""
        self._ylabel = ""

    # --- plot API --------------------------------------------------------
    def plot(self, x, y=None, fmt: str = "", label: str = ""):
        if y is None:
            y = x
            x = None
        y = np.asarray(y)
        if np.iscomplexobj(y):
            self._ops.append(("plot", x, y.real, fmt, label + " (re)"))
            self._ops.append(("plot", x, y.imag, fmt, label + " (im)"))
        else:
            self._ops.append(("plot", x, y, fmt, label))
        return self

    def plot_psd(self, x, fs: float = 1.0, label: str = ""):
        x = np.asarray(x)
        n = len(x)
        X = np.fft.fftshift(np.abs(np.fft.fft(x * np.hanning(n))) ** 2)
        f = np.fft.fftshift(np.fft.fftfreq(n, 1.0 / fs))
        self._ops.append(("plot", f, 10 * np.log10(X + 1e-30), "b-", label))
        self._xlabel = "Frequency"
        self._ylabel = "PSD (dB)"
        return self

    def plot_iq(self, x, fmt: str = "b.", label: str = ""):
        x = np.asarray(x)
        self._ops.append(("scatter", x.real, x.imag, fmt, label))
        return self

    def plot_img(self, Z, extent=None):
        self._ops.append(("img", np.asarray(Z), extent, "", ""))
        return self

    def titles(self, title: str = "", xlabel: str = "", ylabel: str = ""):
        self._title = title or self._title
        self._xlabel = xlabel
        self._ylabel = ylabel
        return self

    # alias parity with the reference naming
    titres = titles

    # --- rendering -------------------------------------------------------
    def _render(self, ax):
        has_label = False
        for op in self._ops:
            kind, a, b, fmt, label = op
            color, line, marker = _parse_fmt(fmt or "")
            if kind == "plot":
                xx = np.arange(len(b)) if a is None else a
                ax.plot(xx, b, color=color, linestyle=line, marker=marker,
                        markersize=4, label=label or None, linewidth=1.0)
            elif kind == "scatter":
                ax.plot(a, b, linestyle="", marker=marker or ".",
                        color=color, markersize=3, label=label or None)
                ax.set_aspect("equal", adjustable="datalim")
            elif kind == "img":
                ax.imshow(a, aspect="auto", origin="lower",
                          extent=b, cmap="viridis")
            if label:
                has_label = True
        if self._title:
            ax.set_title(self._title, fontsize=9)
        if self._xlabel:
            ax.set_xlabel(self._xlabel, fontsize=8)
        if self._ylabel:
            ax.set_ylabel(self._ylabel, fontsize=8)
        if has_label:
            ax.legend(fontsize=7)
        ax.grid(True, alpha=0.3)

    def save(self, path: str, dpi: int = 100):
        fig, ax = plt.subplots(figsize=(8, 4.5))
        self._render(ax)
        fig.tight_layout()
        fig.savefig(path, dpi=dpi)
        plt.close(fig)

    # parity alias
    enregistrer = save

    def show(self, title: str = ""):
        """Send to the active report (parity: Figure::afficher ->
        stdo)."""
        from .report import get_report
        get_report().add_figure(self, title or self._title)

    afficher = show


def plot_eye(x, osf: int, nsym: int = 2, ntraces: int = 200) -> "Figure":
    """Eye diagram: overlay ntraces segments of nsym symbol periods
    (parity: plot_eye, core/src/telecom/graphiques.cc:6-70)."""
    x = np.asarray(x)
    seg = nsym * osf
    f = Figure("Eye diagram")
    nmax = min(ntraces, (len(x) - 1) // seg)
    t = np.arange(seg + 1) / osf
    for i in range(nmax):
        tr = x[i * seg: i * seg + seg + 1]
        f._ops.append(("plot", t, np.real(tr), "b-", ""))
    f._xlabel = "Symbol periods"
    return f


class Figures:
    """Subplot collection (parity: tsd::vue::Figures)."""

    def __init__(self):
        self._subs: List[Figure] = []

    def subplot(self, *_ignored) -> Figure:
        f = Figure()
        self._subs.append(f)
        return f

    def save(self, path: str, dpi: int = 100):
        n = max(len(self._subs), 1)
        ncols = 1 if n <= 3 else 2
        nrows = (n + ncols - 1) // ncols
        fig, axes = plt.subplots(nrows, ncols,
                                 figsize=(8 * ncols, 3 * nrows))
        axes = np.atleast_1d(axes).ravel()
        for f, ax in zip(self._subs, axes):
            f._render(ax)
        for ax in axes[len(self._subs):]:
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(path, dpi=dpi)
        plt.close(fig)

    enregistrer = save

    def show(self, title: str = ""):
        from .report import get_report
        get_report().add_figure(self, title)

    afficher = show
