"""Word-frequency plotters (SURVEY §2 M10), Ray-Data-fed.

The reference renders three matplotlib figures from its two global word
Counters (``preprocess_data.py:110-237``, re-run standalone by
``generate_word_frequency_plots.py``): a top-N horizontal-bar comparison
(raw vs preprocessed tokenization), a log-log rank-frequency curve over
the first 10,000 ranks (Zipf's law), and the same distribution on linear
axes over the first 1,000 ranks.

This module renders the same three figures from the distributed
frequency tables (``ops/wordfreq.py`` — a map-side-combined
``groupby(token)``; the driver only ever holds top-N / top-rank rows,
never the vocabulary):

- with matplotlib installed, via pyplot calls mirroring the reference's
  (barh panels, log-log line plot);
- without it (this sandbox has no matplotlib), via a zero-dependency
  deterministic SVG renderer — same marks, byte-stable output, so the
  figures exist and are testable everywhere.

Backend is chosen per call; ``fmt='svg'`` forces the fallback.
"""

from __future__ import annotations

import math
import os

import pyarrow as pa


def _has_matplotlib() -> bool:
    try:
        import matplotlib  # noqa: F401

        return True
    except ImportError:
        return False


# ------------------------------------------------------------- SVG backend

_SVG_HEAD = (
    '<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}" '
    'viewBox="0 0 {w} {h}" font-family="sans-serif">\n'
    '<rect width="{w}" height="{h}" fill="white"/>\n'
)


def _fmt(x: float) -> str:
    return f"{x:.2f}".rstrip("0").rstrip(".")


def _xml(s_: object) -> str:
    """Escape &, <, > for text nodes — token labels are arbitrary corpus
    strings and one raw '&' invalidates the whole SVG document."""
    from xml.sax.saxutils import escape

    return escape(str(s_))


def _svg_barh_panels(panels, path: str, width: int = 1100,
                     height: int = 560) -> None:
    """Side-by-side horizontal-bar panels:
    ``panels = [(title, color, [(label, count), ...]), ...]``."""
    pw = width // len(panels)
    parts = [_SVG_HEAD.format(w=width, h=height)]
    for p, (title, color, rows) in enumerate(panels):
        x0 = p * pw + 150
        plot_w = pw - 190
        y0, plot_h = 50, height - 90
        parts.append(
            f'<text x="{p * pw + pw // 2}" y="24" text-anchor="middle" '
            f'font-size="14" font-weight="bold">{_xml(title)}</text>\n'
        )
        if not rows:
            continue
        vmax = max(n for _, n in rows) or 1
        bh = plot_h / len(rows)
        for i, (label, n) in enumerate(rows):
            y = y0 + i * bh
            w = plot_w * n / vmax
            parts.append(
                f'<rect x="{x0}" y="{_fmt(y + bh * 0.1)}" '
                f'width="{_fmt(w)}" height="{_fmt(bh * 0.8)}" '
                f'fill="{color}"/>\n'
                f'<text x="{x0 - 6}" y="{_fmt(y + bh * 0.7)}" '
                f'text-anchor="end" font-size="10">{_xml(label)}</text>\n'
                f'<text x="{_fmt(x0 + w + 4)}" y="{_fmt(y + bh * 0.7)}" '
                f'font-size="9">{n}</text>\n'
            )
        parts.append(
            f'<line x1="{x0}" y1="{y0}" x2="{x0}" y2="{y0 + plot_h}" '
            f'stroke="black"/>\n'
            f'<text x="{x0 + plot_w // 2}" y="{height - 12}" '
            f'text-anchor="middle" font-size="12">Frequency</text>\n'
        )
    parts.append("</svg>\n")
    _write(path, "".join(parts))


def _svg_rank_lines(series, path: str, loglog: bool, title: str,
                    width: int = 900, height: int = 540) -> None:
    """Rank-frequency polylines:
    ``series = [(label, color, [n at rank 1, n at rank 2, ...]), ...]``."""
    x0, y0 = 70, 40
    plot_w, plot_h = width - 110, height - 110

    def tx(rank: float, rmax: float) -> float:
        v = math.log10(rank) / max(math.log10(rmax), 1e-9) if loglog \
            else (rank - 1) / max(rmax - 1, 1)
        return x0 + v * plot_w

    def ty(n: float, nmin: float, nmax: float) -> float:
        if loglog:
            lo, hi = math.log10(max(nmin, 1)), math.log10(max(nmax, 1))
            v = (math.log10(max(n, 1)) - lo) / max(hi - lo, 1e-9)
        else:
            v = n / max(nmax, 1)
        return y0 + plot_h * (1 - v)

    rmax = max((len(s[2]) for s in series), default=1) or 1
    nmax = max((s[2][0] for s in series if s[2]), default=1)
    nmin = min((s[2][-1] for s in series if s[2]), default=1)
    parts = [_SVG_HEAD.format(w=width, h=height)]
    parts.append(
        f'<text x="{width // 2}" y="24" text-anchor="middle" '
        f'font-size="14" font-weight="bold">{_xml(title)}</text>\n'
        f'<line x1="{x0}" y1="{y0}" x2="{x0}" y2="{y0 + plot_h}" '
        f'stroke="black"/>\n'
        f'<line x1="{x0}" y1="{y0 + plot_h}" x2="{x0 + plot_w}" '
        f'y2="{y0 + plot_h}" stroke="black"/>\n'
        f'<text x="{x0 + plot_w // 2}" y="{height - 16}" '
        f'text-anchor="middle" font-size="12">Rank'
        f'{" (log scale)" if loglog else ""}</text>\n'
        f'<text x="18" y="{y0 + plot_h // 2}" font-size="12" '
        f'transform="rotate(-90 18 {y0 + plot_h // 2})" '
        f'text-anchor="middle">Frequency'
        f'{" (log scale)" if loglog else ""}</text>\n'
    )
    # decade ticks on log axes, quarter ticks on linear
    ticks = ([10 ** e for e in range(0, int(math.log10(rmax)) + 1)]
             if loglog else [1, rmax // 4, rmax // 2, 3 * rmax // 4, rmax])
    for t in ticks:
        if t < 1:
            continue
        x = tx(t, rmax)
        parts.append(
            f'<line x1="{_fmt(x)}" y1="{y0 + plot_h}" x2="{_fmt(x)}" '
            f'y2="{y0 + plot_h + 5}" stroke="black"/>\n'
            f'<text x="{_fmt(x)}" y="{y0 + plot_h + 18}" '
            f'text-anchor="middle" font-size="10">{t}</text>\n'
        )
    for li, (label, color, ys) in enumerate(series):
        if not ys:
            continue
        pts = " ".join(
            f"{_fmt(tx(r + 1, rmax))},{_fmt(ty(n, nmin, nmax))}"
            for r, n in enumerate(ys)
        )
        parts.append(
            f'<polyline points="{pts}" fill="none" stroke="{color}" '
            f'stroke-width="2" opacity="0.7"/>\n'
            f'<rect x="{x0 + plot_w - 210}" y="{y0 + 8 + 18 * li}" '
            f'width="14" height="8" fill="{color}"/>\n'
            f'<text x="{x0 + plot_w - 190}" y="{y0 + 16 + 18 * li}" '
            f'font-size="11">{_xml(label)}</text>\n'
        )
    parts.append("</svg>\n")
    _write(path, "".join(parts))


def _write(path: str, text: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(text)
    os.replace(tmp, path)


# ------------------------------------------------------ matplotlib backend


def _mpl_barh_panels(panels, path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(panels), figsize=(18, 8))
    for ax, (title, color, rows) in zip(
        axes if len(panels) > 1 else [axes], panels
    ):
        labels = [r[0] for r in rows]
        counts = [r[1] for r in rows]
        ax.barh(range(len(rows)), counts, color=color)
        ax.set_yticks(range(len(rows)))
        ax.set_yticklabels(labels, fontsize=9)
        ax.invert_yaxis()
        ax.set_xlabel("Frequency", fontsize=11)
        ax.set_title(title, fontsize=12, fontweight="bold")
        ax.grid(axis="x", alpha=0.3)
    plt.tight_layout()
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close()


def _mpl_rank_lines(series, path: str, loglog: bool, title: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 7))
    for label, color, ys in series:
        ax.plot(range(1, len(ys) + 1), ys, label=label, alpha=0.7,
                linewidth=2, color=color)
    ax.set_xlabel(f"Rank{' (log scale)' if loglog else ''}", fontsize=12)
    ax.set_ylabel(f"Frequency{' (log scale)' if loglog else ''}", fontsize=12)
    ax.set_title(title, fontsize=14, fontweight="bold")
    if loglog:
        ax.set_xscale("log")
        ax.set_yscale("log")
    ax.legend(fontsize=11)
    ax.grid(True, alpha=0.3)
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close()


# ------------------------------------------------------------------ public


def plot_word_frequencies(top_raw: pa.Table, top_proc: pa.Table,
                          out_dir: str, top_n: int = 30,
                          fmt: str = "auto") -> str:
    """Reference plot 1 (``preprocess_data.py:110-141``): top-N bars,
    raw vs preprocessed.  Inputs are (token, n) tables from
    ``ops.wordfreq.top_words`` (already rank-ordered)."""
    use_mpl = fmt == "png" or (fmt == "auto" and _has_matplotlib())
    ext = "png" if use_mpl else "svg"
    path = os.path.join(out_dir, f"word_frequencies_comparison.{ext}")
    panels = [
        (f"Top {top_n} Words WITHOUT Preprocessing", "skyblue",
         list(zip(top_raw.column("token").to_pylist()[:top_n],
                  top_raw.column("n").to_pylist()[:top_n]))),
        (f"Top {top_n} Words WITH Preprocessing", "lightcoral",
         list(zip(top_proc.column("token").to_pylist()[:top_n],
                  top_proc.column("n").to_pylist()[:top_n]))),
    ]
    (_mpl_barh_panels if use_mpl else _svg_barh_panels)(panels, path)
    return path


def plot_zipf(freqs_raw: list[int], freqs_proc: list[int], out_dir: str,
              max_rank: int = 10000, linear_top: int = 1000,
              fmt: str = "auto") -> list[str]:
    """Reference plots 2/2b (``preprocess_data.py:143-207``): rank-
    frequency curves, log-log over the first ``max_rank`` ranks and
    linear over the first ``linear_top``.  Inputs are frequency values
    sorted descending (the head of the distribution — at web scale never
    the whole vocabulary)."""
    use_mpl = fmt == "png" or (fmt == "auto" and _has_matplotlib())
    ext = "png" if use_mpl else "svg"
    render = _mpl_rank_lines if use_mpl else _svg_rank_lines
    p1 = os.path.join(out_dir, f"frequency_distribution_zipf.{ext}")
    render(
        [("Without Preprocessing", "#1f77b4", list(freqs_raw[:max_rank])),
         ("With Preprocessing", "#ff7f0e", list(freqs_proc[:max_rank]))],
        p1, True, "Word Frequency Distribution (Zipf's Law)",
    )
    p2 = os.path.join(out_dir, f"frequency_distribution_top{linear_top}.{ext}")
    render(
        [("Without Preprocessing", "#1f77b4", list(freqs_raw[:linear_top])),
         ("With Preprocessing", "#ff7f0e", list(freqs_proc[:linear_top]))],
        p2, False, f"Word Frequency Distribution (Top {linear_top} Words)",
    )
    return [p1, p2]


def generate_frequency_plots(ds, out_dir: str, text_col: str = "text",
                             top_n: int = 30, max_rank: int = 10000,
                             fmt: str = "auto") -> dict:
    """End-to-end M10 driver (``generate_word_frequency_plots.py``): two
    distributed frequency aggregations (raw + canonical analyzer), then
    the reference's three figures.  Only the top ``max_rank`` (token, n)
    rows reach the driver per mode (``top_words``' per-block local top-N);
    returns the figure paths + the head tables it plotted."""
    from .wordfreq import top_words

    os.makedirs(out_dir, exist_ok=True)
    head_raw = top_words(ds, top_n=max_rank, text_col=text_col,
                         preprocessed=False)
    head_proc = top_words(ds, top_n=max_rank, text_col=text_col,
                          preprocessed=True)
    bars = plot_word_frequencies(head_raw, head_proc, out_dir,
                                 top_n=top_n, fmt=fmt)
    zipf = plot_zipf(head_raw.column("n").to_pylist(),
                     head_proc.column("n").to_pylist(),
                     out_dir, max_rank=max_rank, fmt=fmt)
    return {"paths": [bars, *zipf], "head_raw": head_raw,
            "head_proc": head_proc}
