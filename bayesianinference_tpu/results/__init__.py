from ..core.containers import WeightedSamples, take_posterior_fraction
from .posterior import (
    predictive_distribution,
    regression_predictive_distribution,
)
from .report import CalculationReport, calculation_report

__all__ = [
    "WeightedSamples",
    "take_posterior_fraction",
    "predictive_distribution",
    "regression_predictive_distribution",
    "CalculationReport",
    "calculation_report",
]
