"""Smoke tests for the full plot suite + log/trace outputs."""

import os

import numpy as np
import pytest

from bayesnmf_tpu import ConvergenceControl
from bayesnmf_tpu.models.sampler import GibbsSampler
from bayesnmf_tpu.utils import plotting


@pytest.fixture(scope="module")
def fitted(tmp_path_factory):
    # 96-row data with trinucleotide row names so COSMIC plots engage fully
    from bayesnmf_tpu.utils.rds import load_example_data

    d = load_example_data()
    M = np.asarray(d["M"], np.float32)
    if hasattr(d["M"], "index"):
        row_names = list(d["M"].index)
    else:
        from bayesnmf_tpu.utils.cosmic import get_cosmic

        row_names = list(get_cosmic().index)
    cc = ConvergenceControl(MAP_over=30, MAP_every=15, miniters=30,
                            maxiters=120, Ninarow_nochange=2, Ninarow_nobest=3)
    out = tmp_path_factory.mktemp("plots")
    s = GibbsSampler(M, 4, likelihood="poisson", prior="exponential", MH=False,
                     convergence_control=cc, output_dir=str(out), seed=0)
    s.row_names = row_names
    s.run_gibbs_sampler()
    return s


def test_trace_plot(fitted):
    fig = plotting.trace_plot(fitted, save=True)
    assert fig is not None
    assert os.path.exists(os.path.join(fitted.output_dir, "trace_plot.png"))
    fig2 = plotting.trace_plot(fitted, MAP_means=True, save=True)
    assert os.path.exists(
        os.path.join(fitted.output_dir, "trace_plot_MAP.png"))


def test_plot_suite(fitted):
    figs = plotting.plot_sampler(fitted, reference_P="cosmic", sigs=True,
                                 save=True)
    for name in ("summary", "similarity_heatmap", "signature_dist", "sig_1"):
        assert name in figs
        assert os.path.exists(os.path.join(fitted.output_dir, f"{name}.png"))


def test_plot_sig_with_reference(fitted):
    fig = plotting.plot_sig(fitted, sig=1, reference_P="cosmic")
    assert fig is not None


def test_summary_frame(fitted):
    df = fitted.summary("cosmic")
    assert {"Signature", "Med_Contribution", "Prop_atleast_1",
            "Reference_Signature", "Cosine_Similarity"} <= set(df.columns)
    assert len(df) == len(np.asarray(fitted.MAP["sig_idx"]))


def test_summarize_samplers(fitted):
    from bayesnmf_tpu.utils.postprocessing import summarize_samplers

    df = summarize_samplers({"run_a": fitted}, "cosmic")
    assert "Name" in df.columns and len(df) > 0


def test_plot_sig_best_mode(fitted):
    """'best' Hungarian-matches the single MAP column against the whole
    reference (postprocessing_visualizations.R:305-309) — may differ from
    the ensemble-vote assignment."""
    fig = plotting.plot_sig(fitted, sig=1, reference_P="cosmic", ref="best")
    assert fig is not None
    title = fig.axes[0].get_title()
    assert "Best match in reference is SBS" in title


def test_plot_sig_named_mode(fitted):
    fig = plotting.plot_sig(fitted, sig=1, reference_P="cosmic", ref="SBS5")
    labels = [t.get_text() for t in fig.axes[0].get_legend().get_texts()]
    assert any("SBS5" in t for t in labels)


def test_signature_dist_residual(fitted):
    """The stacked bars carry a residual component against the MAP
    reconstruction (postprocessing_visualizations.R:834-837, 878-886)."""
    fig = plotting.plot_signature_dist(fitted, reference_P="cosmic")
    labels = [t.get_text() for t in fig.axes[0].get_legend().get_texts()]
    assert any("resid" in t for t in labels)
    assert any("observed" in t for t in labels)
    # subjects subsetting works (reference's subjects argument)
    fig2 = plotting.plot_signature_dist(fitted, subjects=np.arange(10),
                                        reference_P="cosmic")
    assert fig2 is not None


def test_trace_plot_annotation_strip(fitted):
    """Bracket annotation strip (add_annotations, trace_plot.R:154-254):
    one extra axes on top carrying the Inference bracket text."""
    fig = plotting.trace_plot(fitted, annotations=True)
    texts = [t.get_text() for ax in fig.axes for t in ax.texts]
    assert "Inference" in texts
    fig2 = plotting.trace_plot(fitted, annotations=False)
    texts2 = [t.get_text() for ax in fig2.axes for t in ax.texts]
    assert "Inference" not in texts2
