"""Distribution & math substrate (L0 of SURVEY.md §1)."""

from .base import (
    CountingReal,
    Distribution,
    HUGE,
    ProductError,
    TINY,
    cov,
    dist_dataclass,
    entropy,
    has_closed_form_prod,
    logpdf,
    mean,
    mean_cov,
    mean_log,
    mean_mirrorlog,
    mean_precision,
    mean_var,
    mode,
    precision,
    prod,
    register_prod,
    std,
    var,
    vague,
    weightedmean,
)
from .gaussian import (
    AbstractMvNormal,
    AbstractNormal,
    JointGaussian,
    MvNormalMeanCovariance,
    MvNormalMeanPrecision,
    MvNormalMeanScalePrecision,
    MvNormalWeightedMeanPrecision,
    NormalMeanPrecision,
    NormalMeanVariance,
    NormalWeightedMeanPrecision,
    as_mv_weighted_mean_precision,
    as_weighted_mean_precision,
    cholesky,
    chol_solve,
    pd_inverse,
    pd_inverse_and_logdet,
    pd_logdet,
)
from .scalar_families import (  # noqa: F401
    Bernoulli,
    BernoulliLogits,
    Beta,
    Binomial,
    GammaShapeRate,
    GammaShapeScale,
    InverseGamma,
    Poisson,
    Uniform,
)
from .discrete import (
    Categorical,
    Dirichlet,
    DirichletCollection,
    Multinomial,
)
from .matrix import InverseWishart, Wishart, WishartInverseScale
from .mixture import MixtureDist
from .pointmass import LogPdfMessage, PointMass, SampleList, register_pointmass_products

# PointMass absorbs products with every registered family.
register_pointmass_products(
    NormalMeanVariance,
    NormalMeanPrecision,
    NormalWeightedMeanPrecision,
    MvNormalMeanCovariance,
    MvNormalMeanPrecision,
    MvNormalMeanScalePrecision,
    MvNormalWeightedMeanPrecision,
    Bernoulli,
    Beta,
    Binomial,
    GammaShapeRate,
    GammaShapeScale,
    InverseGamma,
    Poisson,
    Uniform,
    Categorical,
    Dirichlet,
    DirichletCollection,
    Multinomial,
    Wishart,
    InverseWishart,
)

# Convenience aliases mirroring the reference's keyword-parametrization resolution
# (src/model/graphppl.jl:340-423): ``Gamma`` defaults to shape-rate.
Gamma = GammaShapeRate

__all__ = [n for n in dir() if not n.startswith("_")]
