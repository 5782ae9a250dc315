"""rxinfer_tpu — a TPU-native message-passing Bayesian inference framework.

A from-scratch JAX/XLA/Pallas implementation of the capability surface of
RxInfer.jl (ReactiveBayes; reference mounted read-only at /root/reference).
Architecture: an ahead-of-time factor-graph compiler lowers a Python ``@model``
to a static XLA message schedule — sum-product / variational message passing with
conjugate closed-form rules, structured & mean-field constraints, and Bethe
free-energy scoring — batched with ``vmap`` and sharded over device meshes with
``psum``/``shard_map`` collectives.

This is not a port: the reference's reactive Rocket.jl push-stream runtime
(src/inference/streaming.jl) is replaced by compiled static schedules
(associative-scan Kalman smoothing for Gaussian chains, forward-backward scans
for HMMs, fixed-point VMP iterations under ``lax.scan``).
"""

from . import dists
from .dists import *  # noqa: F401,F403 — distribution families are top-level API

# Context-sensitive node constructors (shadow same-named raw distribution classes:
# inside an @model trace they create factor nodes, outside they construct
# distributions — the raw classes remain available under rxinfer_tpu.dists).
from .graph import (  # noqa: F401
    factor_node,
    lincomb,
    where,
    RequireMessage,
    RequireMessageFunctionalDependencies,
    AbstractFormConstraint,
    Constraints,
    FixedMarginalFormConstraint,
    FullFactorization,
    InitMessage,
    MeanField,
    factorize,
    factorize_slots,
    PointMassFormConstraint,
    ComposedFormConstraint,
    UnspecifiedFormConstraint,
    SampleListFormConstraint,
    LeftProposal,
    RightProposal,
    AutoProposal,
    constraints,
    AND,
    AR,
    ARMeta,
    ARsafe,
    ARunsafe,
    IMPLY,
    NOT,
    OR,
    Bernoulli,
    Beta,
    Binomial,
    BinomialPolya,
    Categorical,
    ContinuousTransition,
    Delta,
    Dirichlet,
    DirichletCollection,
    DiscreteTransition,
    GCV,
    Gamma,
    GammaMixture,
    InverseGamma,
    InverseWishart,
    Mixture,
    Multinomial,
    MultinomialPolya,
    MvNormal,
    Normal,
    NormalMixture,
    Poisson,
    Probit,
    SoftDot,
    Sum,
    tie,
    Transition,
    Uniform,
    Uninformative,
    Wishart,
    dot,
    latent,
    model,
    plate,
    scope,
    submodel,
)
from .inference import (  # noqa: F401
    InferenceResult,
    KeepEach,
    KeepLast,
    UnfactorizedData,
    batched_program,
    getreturnval,
    infer,
    infer_batched,
    iserror,
    issuccess,
)
from .diagnostics import (  # noqa: F401
    DefaultObjectiveDiagnosticChecks,
    ObjectiveDiagnosticCheckInfs,
    ObjectiveDiagnosticCheckNaNs,
)
from .postprocess import (  # noqa: F401
    LogScaleAnnotations,
    Marginal,
    NoopPostprocess,
    UnpackMarginalPostprocess,
    getannotations,
    getdata,
    getlogscale,
)
from .inference_streaming import (  # noqa: F401
    RxInferenceEngine,
    autoupdates,
)
from .rules.registry import NodeFunctionRuleFallback, call_rule, trace_messages  # noqa: F401
from .rules import CVI, CVIProjection, DeltaMeta, Linearization, Unscented  # noqa: F401
from .utils.callbacks import (  # noqa: F401
    BenchmarkCallbacks,
    benchmark_table,
    profile_trace,
    convert_to_tensorboard,
    StopEarlyIterationStrategy,
    TraceCallbacks,
)
from .utils.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
from .engine.projection import ProjectedTo  # noqa: F401
from .utils import (  # noqa: F401
    Session,
    create_session,
    summarize_session,
    summarize_session_table,
)

__version__ = "0.1.0"
