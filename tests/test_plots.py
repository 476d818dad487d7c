"""M10 frequency plotters: SVG fallback correctness + determinism
(reference figures: preprocess_data.py:110-237)."""

import glob
import os
import xml.etree.ElementTree as ET

import pytest
import ray.data

from elasticsearch_ray.ops.plots import (
    generate_frequency_plots,
    plot_word_frequencies,
    plot_zipf,
)

SVG_NS = "{http://www.w3.org/2000/svg}"


@pytest.fixture(scope="module")
def figs(tiny_corpus_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("plots"))
    ds = ray.data.read_parquet(tiny_corpus_dir)
    res = generate_frequency_plots(ds, out, top_n=20, max_rank=500,
                                   fmt="svg")
    return out, res


def test_three_reference_figures(figs):
    out, res = figs
    names = sorted(os.path.basename(p) for p in res["paths"])
    assert names == [
        "frequency_distribution_top1000.svg",
        "frequency_distribution_zipf.svg",
        "word_frequencies_comparison.svg",
    ]
    for p in res["paths"]:
        ET.parse(p)  # well-formed XML


def test_bar_panel_marks(figs):
    out, res = figs
    root = ET.parse(os.path.join(out, "word_frequencies_comparison.svg")).getroot()
    bars = [r for r in root.iter(f"{SVG_NS}rect")
            if r.get("fill") in ("skyblue", "lightcoral")]
    assert len(bars) == 40  # 20 raw + 20 preprocessed
    # bar widths proportional to the head table counts within each panel
    raw = res["head_raw"].column("n").to_pylist()[:20]
    widths = [float(b.get("width")) for b in bars[:20]]
    assert widths[0] == max(widths)
    for i in range(19):
        if raw[i] > raw[i + 1]:
            assert widths[i] > widths[i + 1]


def test_zipf_polylines(figs):
    out, res = figs
    root = ET.parse(os.path.join(out, "frequency_distribution_zipf.svg")).getroot()
    lines = list(root.iter(f"{SVG_NS}polyline"))
    assert len(lines) == 2
    n_raw = len(res["head_raw"])
    pts = lines[0].get("points").split()
    assert len(pts) == min(n_raw, 500)
    # log-log: y must be non-decreasing (frequency non-increasing) in
    # SVG coordinates (origin top-left)
    ys = [float(p.split(",")[1]) for p in pts]
    assert all(a <= b + 1e-9 for a, b in zip(ys, ys[1:]))


def test_deterministic_bytes(figs, tmp_path_factory):
    out, res = figs
    out2 = str(tmp_path_factory.mktemp("plots2"))
    plot_word_frequencies(res["head_raw"], res["head_proc"], out2,
                          top_n=20, fmt="svg")
    plot_zipf(res["head_raw"].column("n").to_pylist(),
              res["head_proc"].column("n").to_pylist(), out2,
              max_rank=500, fmt="svg")
    for p in sorted(glob.glob(os.path.join(out2, "*.svg"))):
        ref = os.path.join(out, os.path.basename(p))
        assert open(p, "rb").read() == open(ref, "rb").read()


def test_matplotlib_backend_if_available(figs, tmp_path_factory):
    pytest.importorskip("matplotlib")
    out, res = figs
    out3 = str(tmp_path_factory.mktemp("plots3"))
    p = plot_word_frequencies(res["head_raw"], res["head_proc"], out3)
    assert p.endswith(".png") and os.path.getsize(p) > 0
