"""Prebuilt model zoo (the reference's test-suite model families)."""

from .zoo import (
    beta_bernoulli,
    gaussian_unknown_mean_precision,
    gmm,
    hgf,
    hmm,
    kalman_filter_step,
    latent_ar,
    lgssm,
    linear_regression,
)
