"""Parity harness: Flax forward vs the independent numpy spec
(SURVEY.md §4 "Parity harness")."""

from uasr.config import ModelConfig
from uasr.tools.parity import diff_bigru, diff_classifier


def test_classifier_parity():
    rep = diff_classifier(
        ModelConfig(classifier_hidden=48, classifier_layers=3,
                    classifier_context=2),
        vocab_size=11, T=19, seed=3,
    )
    assert rep["max_abs_err"] < 1e-4, rep


def test_bigru_parity():
    rep = diff_bigru(hidden=24, T=15, D=10, seed=5)
    assert rep["max_abs_err"] < 1e-4, rep
