"""Rule registry + node library (L2-equivalent, SURVEY.md §1)."""

from .registry import (
    RuleNotFoundError,
    get_average_energy,
    get_message_rule,
    get_node,
    has_node,
    node,
)
from . import nodes  # noqa: F401 — registers the built-in node library
from . import delta  # noqa: F401 — Delta node (Linearization/Unscented)
from .delta import CVI, CVIProjection, DeltaMeta, Linearization, Unscented  # noqa: F401
from . import special  # noqa: F401 — Probit, GammaMixture
from . import ar  # noqa: F401 — autoregressive node
from . import gcv  # noqa: F401 — Gaussian controlled variance (HGF)
from . import boolean  # noqa: F401 — OR/AND/NOT/IMPLY
from . import polya  # noqa: F401 — Polya-Gamma regression nodes
from . import ctransition  # noqa: F401 — random transition matrices
from .expectations import (  # noqa: F401
    e_cov,
    e_log,
    e_mean,
    e_outer,
    e_precision,
    e_sq,
    e_var,
)
