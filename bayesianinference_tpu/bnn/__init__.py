from .losses import (
    alpha_divergence_loss,
    gaussian_loss,
    net_regularization_loss,
    network_log_evidence,
    regression_loss,
)
from .nets import RegressionNet, regression_net
from .predict import (
    TrainedRegressionNet,
    sample_trained_net,
    train_regression_net,
)

__all__ = [
    "alpha_divergence_loss",
    "gaussian_loss",
    "net_regularization_loss",
    "network_log_evidence",
    "regression_loss",
    "RegressionNet",
    "regression_net",
    "TrainedRegressionNet",
    "sample_trained_net",
    "train_regression_net",
]
