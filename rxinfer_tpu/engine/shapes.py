"""Compile-time shape & family inference over the factor graph.

Event shapes and marginal families for every random variable are resolved
statically (from constant hyperparameters and data shapes) so the compiled XLA
program has fully static shapes — the TPU-side replacement for the reference's
runtime type propagation through Julia dispatch (SURVEY.md §7 hard part (b))."""

from __future__ import annotations

import numpy as np

from ..graph.ir import Const, Factor, ModelGraph, Ref, Variable

# family keys match dists.natural._TABLE
_OUT_FAMILY = {
    "NormalMeanVariance": "gaussian",
    "NormalMeanPrecision": "gaussian",
    "LinearGaussianCovariance": "gaussian",
    "LinearGaussianPrecision": "gaussian",
    "MvNormalMeanCovariance": "mv_gaussian",
    "MvNormalMeanPrecision": "mv_gaussian",
    "MvNormalMeanScalePrecision": "mv_gaussian",
    "MvLinearGaussianCovariance": "mv_gaussian",
    "MvLinearGaussianPrecision": "mv_gaussian",
    "Beta": "beta",
    "Bernoulli": "bernoulli",
    "Binomial": "poisson",  # integer support; marginal carrier unused
    "GammaShapeRate": "gamma",
    "GammaShapeScale": "gamma",
    "InverseGamma": "inverse_gamma",
    "Categorical": "categorical",
    "Dirichlet": "dirichlet",
    "DirichletCollection": "dirichlet_collection",
    "DiscreteTransition": "categorical",
    "Wishart": "wishart",
    "InverseWishart": "inverse_wishart",
    "Poisson": "poisson",
    "Uniform": "gaussian",  # continuous scalar carrier
    "NormalMixture": "gaussian",
    "MvNormalMixture": "mv_gaussian",
    "GammaMixture": "gamma",
    "GaussianDotCovariance": "gaussian",
    "GaussianDotPrecision": "gaussian",
    "Probit": "bernoulli",
    "AR": "mv_gaussian",
    "SoftDot": "gaussian",
    "GCV": "gaussian",
    "OR": "bernoulli",
    "AND": "bernoulli",
    "NOT": "bernoulli",
    "IMPLY": "bernoulli",
    "Mixture": None,
    "BinomialPolya": "poisson",
    "MultinomialPolya": "poisson",
    "Multinomial": "poisson",
    "ContinuousTransition": "mv_gaussian",
    "Sum": None,  # follows inputs (scalar or Mv)
    "LinComb": None,  # out = sum A_i in_i + b: shape from the maps
    "Uninformative": "gaussian",
    "GaussianSumCovariance": "gaussian",
    "GaussianSumPrecision": "gaussian",
    "MvGaussianSumCovariance": "mv_gaussian",
    "MvGaussianSumPrecision": "mv_gaussian",
}


def _delta_out_family(f, infos):
    in_keys = [k for k in f.interfaces if k.startswith("in")]
    del in_keys
    return None


class GroupInfo:
    """Static metadata for one random-variable group."""

    def __init__(self, var: Variable):
        self.var = var
        self.family: str | None = None
        self.event_shape: tuple | None = None

    def __repr__(self):
        return f"GroupInfo({self.var.name}, {self.family}, {self.event_shape})"


def _const_shape(v) -> tuple:
    return tuple(np.shape(v.value))


def infer_event_shape(f: Factor, graph: ModelGraph, known: dict) -> tuple | None:
    """Event shape of f.out from its constant/known interfaces."""
    ifc = f.interfaces
    ff = f.fform

    def shape_of(name):
        v = ifc.get(name)
        if isinstance(v, Const):
            return _const_shape(v)
        if isinstance(v, Ref):
            if v.var.kind == "data":
                return tuple(v.var.event_shape or ())
            g = known.get(v.var.name)
            return g.event_shape if g else None
        return None

    if ff in ("NormalMeanVariance", "NormalMeanPrecision", "Beta", "Bernoulli",
              "GammaShapeRate", "GammaShapeScale", "InverseGamma", "Poisson",
              "Uniform", "Binomial", "NormalMixture", "GammaMixture", "Probit",
              "SoftDot", "GCV", "OR", "AND", "NOT", "IMPLY",
              "Uninformative"):
        return ()
    if ff == "Sum":
        # out = sum of inputs: event shape follows any resolvable input
        for k in f.interfaces:
            if k.startswith("in"):
                s = shape_of(k)
                if s is not None:
                    return s
        return None
    if ff == "LinComb":
        for k, v in f.interfaces.items():
            if k.startswith("A") and k != "A" and isinstance(v, Const):
                sh = _const_shape(v)
                if len(sh) == 2:
                    return (sh[0],)
                if len(sh) == 1:
                    return ()
        # scalar multipliers: out shape follows any resolvable input
        for k in f.interfaces:
            if k.startswith("in"):
                s = shape_of(k)
                if s is not None:
                    return s
        return None
    if ff in ("MvNormalMeanCovariance", "MvNormalMeanPrecision",
              "MvNormalMeanScalePrecision"):
        s = shape_of("mean")
        if s:
            return s
        for key in ("cov", "prec"):
            s = shape_of(key)
            if s:
                return (s[-1],)
        return None
    if ff in ("MvLinearGaussianCovariance", "MvLinearGaussianPrecision"):
        a = shape_of("A")
        if a and len(a) == 2:
            return (a[0],)
        for key in ("cov", "prec"):
            s = shape_of(key)
            if s:
                return (s[-1],)
        return None
    if ff in ("LinearGaussianCovariance", "LinearGaussianPrecision",
              "GaussianDotCovariance", "GaussianDotPrecision",
              "GaussianSumCovariance", "GaussianSumPrecision"):
        return ()
    if ff in ("MvGaussianSumCovariance", "MvGaussianSumPrecision"):
        for key in ("cov", "prec"):
            s = shape_of(key)
            if s:
                return (s[-1],)
        for k in f.interfaces:
            if k.startswith("in"):
                s = shape_of(k)
                if s:
                    return s
        return None
    if ff == "MvNormalMixture":
        for key in list(f.interfaces):
            if key.startswith("mean"):
                s = shape_of(key)
                if s:
                    return s
            if key.startswith("prec"):
                s = shape_of(key)
                if s:
                    return (s[-1],)
        return None
    if ff == "Categorical":
        s = shape_of("p")
        return (s[-1],) if s else None
    if ff == "Dirichlet":
        s = shape_of("alpha")
        return s
    if ff == "DirichletCollection":
        return shape_of("alpha")
    if ff == "DiscreteTransition":
        s = shape_of("matrix")
        return (s[0],) if s else None
    if ff == "AR":
        k = (f.meta or {}).get("order")
        return (int(k),) if k else None
    if ff in ("Wishart",):
        s = shape_of("S")
        return s
    if ff in ("InverseWishart",):
        s = shape_of("Psi")
        return s
    if ff in ("Delta", "NonlinearGaussianCovariance", "NonlinearGaussianPrecision"):
        fn = (f.meta or {}).get("fn")
        in_keys = sorted((k for k in f.interfaces if k.startswith("in")),
                         key=lambda k: int(k[2:]))
        shapes = [shape_of(k) for k in in_keys]
        if fn is None or any(s is None for s in shapes):
            return None
        probes = [np.zeros(s, dtype=np.float32) if s else np.float32(0.0)
                  for s in shapes]
        try:
            out = np.asarray(fn(*probes))
        except Exception:
            return None
        return tuple(out.shape)
    return None


def infer_input_shape(f: Factor, iface: str, out_shape) -> tuple | None:
    """Event shape of a random *input* interface, where derivable."""
    ff = f.fform
    if ff in ("MvLinearGaussianCovariance", "MvLinearGaussianPrecision") and iface == "in":
        a = f.interfaces.get("A")
        if isinstance(a, Const):
            s = _const_shape(a)
            if len(s) == 2:
                return (s[1],)
    if ff == "DiscreteTransition" and iface == "in":
        m = f.interfaces.get("matrix")
        if isinstance(m, Const):
            return (_const_shape(m)[1],)
    if ff in ("BinomialPolya", "MultinomialPolya") and iface == "beta":
        x = f.interfaces.get("x")
        if isinstance(x, Const):
            return (_const_shape(x)[-1],)
        if isinstance(x, Ref) and x.var.kind == "data":
            return (tuple(x.var.event_shape)[-1],)
        return None
    if ff == "MvNormalMixture":
        if iface.startswith("mean"):
            return out_shape
        if iface.startswith("prec") and out_shape:
            return (out_shape[-1], out_shape[-1])
        if iface == "switch":
            k = (f.meta or {}).get("K")
            return (int(k),) if k else None
    if ff == "AR" and iface in ("in", "theta"):
        k = (f.meta or {}).get("order")
        return (int(k),) if k else None
    if ff in ("GaussianDotCovariance", "GaussianDotPrecision") and iface == "in":
        a = f.interfaces.get("A")
        if isinstance(a, Const):
            return (_const_shape(a)[-1],)
        if isinstance(a, Ref) and a.var.kind == "data":
            return (tuple(a.var.event_shape)[-1],)
    if ff in ("MvNormalMeanCovariance", "MvNormalMeanPrecision") and iface == "mean":
        return out_shape
    if ff in ("NormalMeanVariance", "NormalMeanPrecision") and iface == "mean":
        return ()
    if ff in ("GaussianSumCovariance", "GaussianSumPrecision") and iface.startswith("in"):
        return ()
    if ff in ("MvGaussianSumCovariance", "MvGaussianSumPrecision") and iface.startswith("in"):
        return out_shape
    if ff == "Sum" and iface.startswith("in"):
        return out_shape
    if ff == "LinComb" and iface.startswith("in"):
        a = f.interfaces.get("A" + iface[2:])
        if isinstance(a, Const):
            sh = _const_shape(a)
            if len(sh) >= 1:
                # trailing dim 1 = column map from a scalar input
                return (sh[-1],) if sh[-1] > 1 else ()
            return out_shape  # scalar multiplier: same space as out
        return None
    return None


# family of a random input interface (what conjugate carrier its marginal uses)
def input_family(f: Factor, iface: str) -> str | None:
    ff = f.fform
    table = {
        ("NormalMeanPrecision", "mean"): "gaussian",
        ("NormalMeanPrecision", "prec"): "gamma",
        ("NormalMeanVariance", "mean"): "gaussian",
        ("NormalMeanVariance", "var"): "inverse_gamma",
        ("MvNormalMeanPrecision", "mean"): "mv_gaussian",
        ("MvNormalMeanPrecision", "prec"): "wishart",
        ("MvNormalMeanCovariance", "mean"): "mv_gaussian",
        ("MvNormalMeanCovariance", "cov"): "inverse_wishart",
        ("MvLinearGaussianCovariance", "in"): "mv_gaussian",
        ("MvLinearGaussianPrecision", "in"): "mv_gaussian",
        ("MvLinearGaussianPrecision", "prec"): "wishart",
        ("LinearGaussianCovariance", "in"): "gaussian",
        ("LinearGaussianPrecision", "in"): "gaussian",
        ("LinearGaussianPrecision", "prec"): "gamma",
        ("GaussianDotCovariance", "in"): "mv_gaussian",
        ("GaussianDotPrecision", "in"): "mv_gaussian",
        ("GaussianDotPrecision", "prec"): "gamma",
        ("GaussianSumPrecision", "prec"): "gamma",
        ("MvGaussianSumPrecision", "prec"): "wishart",
        ("Bernoulli", "p"): "beta",
        ("Binomial", "p"): "beta",
        ("Categorical", "p"): "dirichlet",
        ("DiscreteTransition", "in"): "categorical",
        ("DiscreteTransition", "matrix"): "dirichlet_collection",
        ("GammaShapeRate", "rate"): "gamma",
        ("Poisson", "rate"): "gamma",
        ("Dirichlet", "alpha"): None,
        ("NormalMixture", "switch"): "categorical",
        ("GammaMixture", "switch"): "categorical",
        ("Probit", "in"): "gaussian",
        ("AR", "in"): "mv_gaussian",
        ("AR", "theta"): "mv_gaussian",
        ("AR", "gamma"): "gamma",
        ("SoftDot", "theta"): "mv_gaussian",
        ("SoftDot", "x"): "mv_gaussian",
        ("SoftDot", "gamma"): "gamma",
        ("GCV", "in"): "gaussian",
        ("GCV", "z"): "gaussian",
        ("OR", "in1"): "bernoulli",
        ("OR", "in2"): "bernoulli",
        ("AND", "in1"): "bernoulli",
        ("AND", "in2"): "bernoulli",
        ("IMPLY", "in1"): "bernoulli",
        ("IMPLY", "in2"): "bernoulli",
        ("NOT", "in"): "bernoulli",
        ("Mixture", "switch"): "categorical",
        ("BinomialPolya", "beta"): "mv_gaussian",
        ("MultinomialPolya", "beta"): "mv_gaussian",
        ("Multinomial", "p"): "dirichlet",
        ("ContinuousTransition", "in"): "mv_gaussian",
        ("ContinuousTransition", "theta"): "mv_gaussian",
        ("ContinuousTransition", "prec"): "wishart",
    }
    if ff == "NormalMixture":
        if iface.startswith("mean"):
            return "gaussian"
        if iface.startswith("prec"):
            return "gamma"
    if ff == "MvNormalMixture":
        if iface == "switch":
            return "categorical"
        if iface.startswith("mean"):
            return "mv_gaussian"
        if iface.startswith("prec"):
            return "wishart"
    if ff == "GammaMixture":
        if iface.startswith("shape") or iface.startswith("rate"):
            return "gamma"
    if ff in ("Delta", "NonlinearGaussianCovariance",
              "NonlinearGaussianPrecision") and iface.startswith("in"):
        return None  # shape decides gaussian vs mv_gaussian (filled in pass)
    if ff in ("Sum", "LinComb") and iface.startswith("in"):
        return None  # shape decides gaussian vs mv_gaussian (out mirrors inputs)
    if ff in ("GaussianSumCovariance", "GaussianSumPrecision") and iface.startswith("in"):
        return "gaussian"
    if ff in ("MvGaussianSumCovariance", "MvGaussianSumPrecision") and iface.startswith("in"):
        return "mv_gaussian"
    if ff == "NonlinearGaussianPrecision" and iface == "prec":
        return "gamma"
    if ff in ("BinomialPolya", "MultinomialPolya") and iface == "beta":
        return "mv_gaussian"
    return table.get((ff, iface))


def resolve_groups(graph: ModelGraph) -> dict[str, GroupInfo]:
    """Fixed-point pass assigning (family, event_shape) to every random group."""
    infos = {v.name: GroupInfo(v) for v in graph.random_variables()}

    for _ in range(8):
        changed = False
        for f in graph.factors:
            # out
            if f.out.var.kind == "random":
                gi = infos[f.out.var.name]
                fam = _OUT_FAMILY.get(f.fform)
                if gi.family is None and fam is not None:
                    gi.family = fam
                    changed = True
                if gi.event_shape is None:
                    s = infer_event_shape(f, graph, infos)
                    if s is not None:
                        gi.event_shape = s
                        changed = True
                if f.fform in ("Delta", "NonlinearGaussianCovariance",
                               "NonlinearGaussianPrecision", "Sum", "LinComb") \
                        and gi.family is None and gi.event_shape is not None:
                    gi.family = "mv_gaussian" if len(gi.event_shape) == 1 else "gaussian"
                    changed = True
            # random inputs
            for name, v in f.interfaces.items():
                if isinstance(v, Ref) and v.var.kind == "random":
                    gi = infos[v.var.name]
                    fam = input_family(f, name)
                    if gi.family is None and fam is not None:
                        gi.family = fam
                        changed = True
                    if gi.event_shape is None:
                        out_gi = infos.get(f.out.var.name)
                        out_shape = out_gi.event_shape if out_gi else (
                            tuple(f.out.var.event_shape or ()) if f.out.var.kind == "data" else None
                        )
                        s = infer_input_shape(f, name, out_shape)
                        if s is None and fam in ("gamma", "beta", "bernoulli", "poisson", "inverse_gamma"):
                            s = ()
                        if s is None and fam == "wishart" and out_shape:
                            s = (out_shape[-1], out_shape[-1])
                        if s is None and fam == "inverse_wishart" and out_shape:
                            s = (out_shape[-1], out_shape[-1])
                        if s is not None:
                            gi.event_shape = s
                            changed = True
        if not changed:
            break

    missing = [n for n, gi in infos.items() if gi.family is None or gi.event_shape is None]
    if missing:
        raise ValueError(
            f"Could not infer family/event-shape for variables: {missing}. "
            "Add explicit initialization or constant parametrization."
        )
    return infos
