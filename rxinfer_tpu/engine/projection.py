"""Exponential-family manifold projection (the real thing).

Reference: ExponentialFamilyProjection via ProjectionExt
(ext/ProjectionExt/ProjectionExt.jl:24-67) — when a variable's incoming
messages have no closed-form product (non-conjugate model), the product
density is projected onto a chosen exponential family by stochastic
NATURAL-GRADIENT descent on the manifold, warm-started from the previous
projection (ProjectionContext).

TPU-native formulation.  For q_η in an exponential family with sufficient
statistics T(x), maximizing the M-projection objective
ELBO(η) = E_q[log p̃(x)] + H[q_η] has natural gradient

    ∇̃ ELBO = ∇_μ E_q[log p̃] − η,

so natural-gradient ascent is the damped fixed point
η ← (1−ρ) η + ρ ∇_μ E_q[log p̃], with the mean-parameter gradient estimated
per iteration from S samples of the CURRENT iterate by the Fisher-preconditioned
score estimator

    ∇_μ E_q[f] = F⁻¹ Cov_q(T, f),   F = Cov_q(T, T),

— a (P×P) solve per step (P = natural-parameter count; tiny).  Everything is
a fixed-length ``lax.fori_loop`` inside the compiled program: compile-time
O(1) in the iteration budget, no host round-trips.  Iterates are projected
back into the family's natural domain after every step, and the returned
point is the Polyak average of the trailing half of the trajectory (averages
out the MC noise).

The same sufficient-statistics registry powers the exact M-projection of
WEIGHTED SAMPLE CLOUDS (``fit_weighted_samples``): matching E[T(x)] is the
maximum-likelihood exponential-family fit, inverted per family (closed-form
for Gaussians; Newton on digamma systems for beta/gamma/dirichlet) — shared
by SampleList products and CVI-style delta projections.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, polygamma

from ..dists import (
    Beta,
    Dirichlet,
    GammaShapeRate,
    MvNormalWeightedMeanPrecision,
    NormalMeanVariance,
)
from ..dists.gaussian import AbstractMvNormal, AbstractNormal
from ..dists.natural import family_key, from_natural, prod_all, to_natural
from ..graph.constraints import AbstractFormConstraint

# sufficient statistics matching dists/natural.py natural-parameter layouts:
# logpdf(x) = Σ_k η_k · T_k(x) − A(η) (+ base measure)
_SUFF = {
    "gaussian": lambda x: (x, -0.5 * x * x),
    "mv_gaussian": lambda x: (x, -0.5 * x[..., :, None] * x[..., None, :]),
    "beta": lambda x: (jnp.log(x), jnp.log1p(-x)),
    "gamma": lambda x: (jnp.log(x), -x),
    "dirichlet": lambda x: (jnp.log(x),),
    # discrete targets (round-4: ProjectionExt.jl is generic over ANY
    # ProjectedTo(T) family; these close the gap for count models)
    "bernoulli": lambda x: (x,),
    "poisson": lambda x: (x,),
    "binomial": lambda x: (x,),
}

SUPPORTED = tuple(sorted(_SUFF))


def _nat_to_dist(family: str, nat: tuple, n_trials=None):
    """from_natural with the binomial special case (its n is a non-natural
    parameter carried on the constraint, not in the registry)."""
    if family == "binomial":
        from ..dists import Binomial

        return Binomial(jnp.asarray(n_trials, jnp.float32),
                        jax.nn.sigmoid(nat[0]))
    return from_natural(family, nat)


def _dist_to_nat(family: str, dist):
    if family == "binomial":
        p = jnp.clip(dist.p, 1e-6, 1.0 - 1e-6)
        return (jnp.log(p) - jnp.log1p(-p),)
    return to_natural(dist)


def _project_domain(family: str, nat: tuple) -> tuple:
    """Clamp a natural-parameter iterate back into the family's open domain
    (the manifold retraction of the reference's Riemannian machinery)."""
    if family == "gaussian":
        return (nat[0], jnp.clip(nat[1], 1e-8))
    if family == "mv_gaussian":
        w = 0.5 * (nat[1] + jnp.swapaxes(nat[1], -1, -2))
        evals, evecs = jnp.linalg.eigh(w)
        evals = jnp.clip(evals, 1e-6)
        w = jnp.einsum("...ij,...j,...kj->...ik", evecs, evals, evecs)
        return (nat[0], w)
    if family == "beta":
        return (jnp.clip(nat[0], -0.999), jnp.clip(nat[1], -0.999))
    if family == "gamma":
        return (jnp.clip(nat[0], -0.999), jnp.clip(nat[1], 1e-6))
    if family == "dirichlet":
        return (jnp.clip(nat[0], -0.999),)
    if family in ("bernoulli", "binomial"):
        # η = logit p: clip to keep sigmoid/score finite in float32
        return (jnp.clip(nat[0], -15.0, 15.0),)
    if family == "poisson":
        # η = log λ
        return (jnp.clip(nat[0], -15.0, 15.0),)
    raise ValueError(f"unsupported projection family {family!r}")


def _flatten(nat: tuple):
    leaves = [jnp.ravel(jnp.asarray(n, jnp.float32)) for n in nat]
    shapes = [jnp.shape(jnp.asarray(n)) for n in nat]
    return jnp.concatenate(leaves) if leaves else jnp.zeros((0,)), shapes


def _unflatten(vec, shapes):
    out, off = [], 0
    for s in shapes:
        n = 1
        for d in s:
            n *= d
        out.append(vec[off:off + n].reshape(s))
        off += n
    return tuple(out)


def _stats_matrix(family: str, z):
    """T(z) flattened: (S, P)."""
    t = _SUFF[family](z)
    return jnp.concatenate(
        [jnp.reshape(tk, (z.shape[0], -1)) for tk in t], axis=-1
    )


def project_logpdf(family: str, logpdf_fn, initial, *, n_iters: int = 40,
                   n_samples: int = 512, step: float = 0.4,
                   decay: float = 0.05, ridge: float = 1e-5, seed: int = 0,
                   n_trials=None):
    """Stochastic natural-gradient projection of an unnormalized log-density
    onto the exponential family, warm-started from ``initial`` (a distribution
    of the target family).  Returns the projected distribution.

    Pure JAX — runs inside compiled programs; all loop structure static."""
    if family not in _SUFF:
        raise ValueError(
            f"projection supports families {SUPPORTED}, got {family!r}"
        )
    eta0 = tuple(jnp.asarray(n, jnp.float32)
                 for n in _dist_to_nat(family, initial))
    vec0, shapes = _flatten(eta0)
    p = vec0.shape[0]
    key = jax.random.PRNGKey(seed)
    half = max(1, n_iters // 2)  # n_iters=1 must not divide the average by 0

    def body(i, carry):
        vec, avg = carry
        nat = _project_domain(family, _unflatten(vec, shapes))
        q = _nat_to_dist(family, nat, n_trials)
        z = jnp.asarray(
            q.sample(jax.random.fold_in(key, i), (n_samples,)), jnp.float32)
        t = _stats_matrix(family, z)                      # (S, P)
        # Control-variated residual: Cov(T, log p̃ − log q_η) = Cov(T, f) − Fη,
        # so F⁻¹ Cov(T, residual) estimates the natural gradient
        # ∇_μ E_q[log p̃] − η DIRECTLY — and its variance VANISHES as q_η
        # approaches an in-family target (log p̃ − log q → const), giving
        # machine-precision convergence instead of an SGD noise floor.
        f = logpdf_fn(z) - q.logpdf(z)                    # (S,)
        tc = t - jnp.mean(t, axis=0, keepdims=True)
        fc = f - jnp.mean(f)
        g_eta = tc.T @ fc / n_samples                     # (P,)
        fisher = tc.T @ tc / n_samples + ridge * jnp.eye(p)
        g_nat = jnp.linalg.solve(fisher, g_eta)
        rho = step / (1.0 + decay * i)
        new_vec, _ = _flatten(_project_domain(
            family,
            _unflatten(vec + rho * g_nat, shapes),
        ))
        avg = jnp.where(i >= n_iters - half, avg + new_vec / half, avg)
        return new_vec, avg

    _, avg = jax.lax.fori_loop(0, n_iters, body,
                               (vec0, jnp.zeros_like(vec0)))
    return _nat_to_dist(
        family, _project_domain(family, _unflatten(avg, shapes)), n_trials
    )


# ---------------------------------------------------------------------------------
# Exact M-projection of weighted sample clouds (max-likelihood exp-family fit:
# match E[T(x)]); shared by SampleList products and CVI delta projections.
# ---------------------------------------------------------------------------------

def _inv_digamma(y, iters: int = 5):
    """Newton inverse of digamma (Minka 2000 appendix C initialization)."""
    x = jnp.where(y >= -2.22, jnp.exp(y) + 0.5, -1.0 / (y - digamma(1.0)))
    for _ in range(iters):
        x = x - (digamma(x) - y) / jnp.clip(polygamma(1, x), 1e-10)
        x = jnp.clip(x, 1e-8)
    return x


def fit_weighted_samples(family: str, samples, weights):
    """Fit the exponential family to a weighted sample cloud by matching the
    weighted sufficient-statistic means (the exact M-projection)."""
    w = weights / jnp.clip(jnp.sum(weights), 1e-30)
    if family == "gaussian":
        m = jnp.sum(w * samples)
        v = jnp.clip(jnp.sum(w * (samples - m) ** 2), 1e-10)
        return NormalMeanVariance(m, v)
    if family == "mv_gaussian":
        m = jnp.einsum("s,si->i", w, samples)
        c = samples - m
        v = jnp.einsum("s,si,sj->ij", w, c, c)
        v = v + 1e-8 * jnp.eye(v.shape[-1])
        from ..dists.gaussian import pd_inverse

        prec = pd_inverse(v)
        return MvNormalWeightedMeanPrecision(prec @ m, prec)
    if family == "beta":
        s = jnp.clip(samples, 1e-6, 1.0 - 1e-6)
        e_lx = jnp.sum(w * jnp.log(s))
        e_l1x = jnp.sum(w * jnp.log1p(-s))
        # init from method of moments, refine by Newton on the digamma system
        m = jnp.sum(w * s)
        v = jnp.clip(jnp.sum(w * (s - m) ** 2), 1e-10)
        common = jnp.clip(m * (1 - m) / v - 1.0, 1e-2)
        a, b = jnp.clip(m * common, 1e-2), jnp.clip((1 - m) * common, 1e-2)
        for _ in range(10):
            # gradient of the fit loss = (ψ(a)−ψ(a+b)−E[log x],
            #                             ψ(b)−ψ(a+b)−E[log 1−x])
            ga = digamma(a) - digamma(a + b) - e_lx
            gb = digamma(b) - digamma(a + b) - e_l1x
            # Jacobian [[ψ'(a)−ψ'(a+b), −ψ'(a+b)], [−ψ'(a+b), ψ'(b)−ψ'(a+b)]]
            tab = polygamma(1, a + b)
            j11 = polygamma(1, a) - tab
            j22 = polygamma(1, b) - tab
            det = jnp.clip(j11 * j22 - tab * tab, 1e-12)
            da = (j22 * ga + tab * gb) / det
            db = (tab * ga + j11 * gb) / det
            a = jnp.clip(a - da, 1e-3)
            b = jnp.clip(b - db, 1e-3)
        return Beta(a, b)
    if family == "gamma":
        s = jnp.clip(samples, 1e-10)
        e_x = jnp.sum(w * s)
        e_lx = jnp.sum(w * jnp.log(s))
        # solve log(a) − ψ(a) = log E[x] − E[log x] by Newton, then b = a/E[x]
        gap = jnp.clip(jnp.log(e_x) - e_lx, 1e-8)
        a = 0.5 / gap  # classic initialization
        for _ in range(8):
            g = jnp.log(a) - digamma(a) - gap
            dg = 1.0 / a - polygamma(1, a)
            a = jnp.clip(a - g / jnp.where(jnp.abs(dg) > 1e-12, dg, 1e-12),
                         1e-3)
        return GammaShapeRate(a, a / jnp.clip(e_x, 1e-10))
    if family == "bernoulli":
        from ..dists import BernoulliLogits

        m = jnp.clip(jnp.sum(w * samples), 1e-6, 1.0 - 1e-6)
        return BernoulliLogits(jnp.log(m) - jnp.log1p(-m))
    if family == "poisson":
        from ..dists import Poisson

        return Poisson(jnp.clip(jnp.sum(w * samples), 1e-8))
    if family == "dirichlet":
        s = jnp.clip(samples, 1e-6)
        s = s / jnp.sum(s, axis=-1, keepdims=True)
        e_lx = jnp.einsum("s,sk->k", w, jnp.log(s))
        alpha = jnp.ones_like(e_lx)
        for _ in range(8):
            # Minka fixed point warmup: ψ(α_k) = ψ(Σα) + E[log x_k]
            alpha = _inv_digamma(digamma(jnp.sum(alpha)) + e_lx)
        for _ in range(8):
            # Newton refinement with the diagonal+rank-one Hessian inverted
            # by Sherman–Morrison (Minka 2000, "Estimating a Dirichlet
            # distribution", eq. 10-15)
            a0 = jnp.sum(alpha)
            g = digamma(a0) - digamma(alpha) + e_lx
            q = -polygamma(1, alpha)
            z = polygamma(1, a0)
            b = jnp.sum(g / q) / (1.0 / z + jnp.sum(1.0 / q))
            alpha = jnp.clip(alpha - (g - b) / q, 1e-3)
        return Dirichlet(alpha)
    raise ValueError(f"unsupported sample-fit family {family!r}")


# ---------------------------------------------------------------------------------
# Importance-sampling initializer (used when no warm start exists yet)
# ---------------------------------------------------------------------------------

def _is_initializer(family: str, msgs, n_samples: int, seed: int,
                    proposal_scale: float = 2.0):
    """One-pass self-normalized importance sampling + weighted-cloud fit —
    a robust initial point for the natural-gradient refinement."""
    key = jax.random.PRNGKey(seed + 101)
    gauss = [m for m in msgs if isinstance(m, AbstractNormal)]
    mv = [m for m in msgs if isinstance(m, AbstractMvNormal)]
    if family == "dirichlet":
        dirs = [m for m in msgs if isinstance(m, Dirichlet)]
        proposal = (prod_all(dirs) if dirs
                    else Dirichlet(jnp.ones(_dirichlet_dim(msgs))))
        z = proposal.sample(key, (n_samples,))
        logw = sum(m.logpdf(z) for m in msgs) - proposal.logpdf(z)
    elif family == "mv_gaussian" and mv:
        m0 = sum(p.mean() for p in mv) / len(mv)
        v0 = sum(p.cov() for p in mv) / len(mv) * proposal_scale
        from ..dists import MvNormalMeanCovariance

        proposal = MvNormalMeanCovariance(m0, v0)
        z = proposal.sample(key, (n_samples,))
        logw = sum(m.logpdf(z) for m in msgs) - proposal.logpdf(z)
    else:
        if gauss:
            m0 = sum(p.mean() for p in gauss) / len(gauss)
            v0 = sum(p.var() for p in gauss) / len(gauss) * proposal_scale
        else:
            m0, v0 = jnp.asarray(0.0), jnp.asarray(4.0)
        proposal = NormalMeanVariance(m0, v0)
        z0 = proposal.sample(key, (n_samples,))
        if family == "beta":
            z = jax.nn.sigmoid(z0 * 2.0)  # squash onto (0,1)
            log_jac = jnp.log(2.0 * z * (1.0 - z))
        elif family == "gamma":
            z = jnp.exp(z0)
            log_jac = jnp.log(z)
        else:
            z, log_jac = z0, jnp.zeros_like(z0)
        logw = (sum(m.logpdf(z) for m in msgs)
                - proposal.logpdf(z0) + log_jac)
    logw = logw - jnp.max(logw)
    w = jnp.exp(logw)
    return fit_weighted_samples(family, z, w)


def _dirichlet_dim(msgs) -> int:
    for m in msgs:
        if isinstance(m, Dirichlet):
            return m.alpha.shape[-1]
    raise ValueError(
        "ProjectedTo('dirichlet') without a Dirichlet message needs a warm "
        "start: provide initialization= for the constrained variable."
    )


class ProjectedTo(AbstractFormConstraint):
    """Project a (possibly non-conjugate) message product onto a family by
    stochastic natural-gradient descent on the exponential-family manifold
    (reference ProjectedTo + ExponentialFamilyProjection,
    ext/ProjectionExt/ProjectionExt.jl:24-67).

    ``ProjectedTo("beta")`` / ``("gaussian")`` / ``("mv_gaussian")`` /
    ``("gamma")`` / ``("dirichlet")``.  Warm-started: inside the engine the
    previous sweep's marginal seeds the descent (the reference's
    ProjectionContext); the first sweep seeds from the @initialization
    marginal or an importance-sampling moment fit."""

    def __init__(self, family: str, n_samples: int = 512, seed: int = 0,
                 n_iters: int = 40, step: float = 0.4,
                 proposal_scale: float = 2.0, n=None):
        if family not in _SUFF:
            raise ValueError(f"ProjectedTo supports {SUPPORTED}")
        if family == "binomial" and n is None:
            raise ValueError(
                "ProjectedTo('binomial') needs the trial count: "
                "ProjectedTo('binomial', n=...) — n is a non-natural "
                "parameter of the family."
            )
        self.family = family
        self.n_samples = n_samples
        self.seed = seed
        self.n_iters = n_iters
        self.step = step
        self.proposal_scale = proposal_scale
        self.n = n

    # engine hook: called with the raw message list instead of prod_all;
    # ``prev`` is the variable's previous marginal (warm start across sweeps)
    def project_product(self, msgs, prev=None):
        # exact fast path (reference: same-family convert, ProjectionExt:28-35)
        try:
            if all(family_key(m) == self.family for m in msgs):
                return prod_all(msgs)
        except Exception:  # noqa: BLE001 — unregistered/fallback carriers
            pass
        if prev is not None and self._same_family(prev):
            initial = prev
        elif self.family in ("bernoulli", "poisson", "binomial"):
            # one-parameter discrete targets converge from the vague point in
            # a handful of natural-gradient steps; no IS moment fit needed
            from ..dists import BernoulliLogits, Binomial, Poisson

            initial = {
                "bernoulli": lambda: BernoulliLogits(jnp.zeros(())),
                "poisson": lambda: Poisson(jnp.ones(())),
                "binomial": lambda: Binomial(
                    jnp.asarray(self.n, jnp.float32), jnp.full((), 0.5)),
            }[self.family]()
        else:
            initial = _is_initializer(
                self.family, [m for m in msgs if not hasattr(m, "log_fn")]
                or msgs, self.n_samples, self.seed, self.proposal_scale,
            )

        def log_prod(x):
            return sum(m.logpdf(x) for m in msgs)

        return project_logpdf(
            self.family, log_prod, initial,
            n_iters=self.n_iters, n_samples=self.n_samples,
            step=self.step, seed=self.seed, n_trials=self.n,
        )

    def _same_family(self, dist) -> bool:
        if self.family == "binomial":
            from ..dists import Binomial

            return isinstance(dist, Binomial)
        try:
            return family_key(dist) == self.family
        except Exception:  # noqa: BLE001 — unregistered carriers
            return False

    def constrain(self, dist):
        # already a closed-form marginal: exact convert when same family,
        # else project its logpdf (reference ProjectionExt:28-46)
        if self._same_family(dist):
            return dist
        return self.project_product([dist])
