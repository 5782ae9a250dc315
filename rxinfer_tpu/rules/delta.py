"""Delta (nonlinear deterministic) node: out = fn(in0, in1, ...).

Reference: ReactiveMP delta-node machinery with approximation methods as node
meta (docs/src/manuals/inference/delta-node.md:14-119):
  * Linearization  — first-order Taylor via jax.jacfwd (the reference uses
    ForwardDiff; here the transform is traced and fused into the schedule),
  * Unscented      — sigma-point transform (alpha/beta/kappa parameters),
  * known inverse  — exact backward mean transport through fn⁻¹.

Messages are moment-matched Gaussians.  Multiple inputs are handled by joint
linearization / joint sigma points over the concatenated input vector.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..dists import (
    MvNormalMeanCovariance,
    MvNormalWeightedMeanPrecision,
    NormalMeanVariance,
    NormalWeightedMeanPrecision,
    PointMass,
)
from ..dists.gaussian import _symmetrize, pd_inverse
from .expectations import e_cov, e_mean, e_var
from .registry import node


def _fp32(fn):
    """Pin delta-rule linear algebra to strict-fp32 matmuls.

    Delta messages are tiny (d≤~16) matrix products feeding inversions and
    joint conditioning; the MXU's default bf16-ish passes gain nothing at
    these sizes but lose enough mantissa that the backward conditioning can
    go indefinite and NaN on chip (observed round 5: full-rank 2×2 linear
    delta, finite cov but NaN mean at default precision, exact at float32).
    """
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


@dataclasses.dataclass
class Linearization:
    """First-order Taylor approximation (reference Linearization())."""


@dataclasses.dataclass
class Unscented:
    """Sigma-point transform (reference Unscented(alpha,beta,kappa))."""

    alpha: float = 1e-3
    beta: float = 2.0
    kappa: float = 0.0


@dataclasses.dataclass
class CVIProjection:
    """Sampling-based projection of the delta transform (reference
    CVIProjection — projection-based conjugate VI, and its deprecated
    Optimisers-based predecessor CVI, docs/src/manuals/inference/delta-node.md:
    the non-deterministic approximation tier).  Draws ``n_samples`` joint-input
    samples, pushes them through fn, and moment-matches the (inputs, out)
    joint — the Gaussian-family instance of an exponential-family projection,
    done in one batched pass instead of a natural-gradient descent loop.

    ``out_family`` projects the pushed-forward OUT message onto a non-Gaussian
    exponential family instead (exact M-projection of the sample cloud via
    engine/projection.fit_weighted_samples — the machinery shared with
    ProjectedTo; reference: CVIProjection's out-projection parameters)."""

    n_samples: int = 1024
    seed: int = 0
    out_family: Optional[str] = None


# deprecated reference alias (CHANGELOG: CVI superseded by CVIProjection)
CVI = CVIProjection


@dataclasses.dataclass
class DeltaMeta:
    """Reference DeltaMeta(method=..., inverse=...)."""

    method: object = None
    inverse: Optional[Callable | Sequence[Callable]] = None


def _meta(q) -> dict:
    m = q.get("_meta") or {}
    return m


def _inputs(q):
    return sorted((k for k in q if k.startswith("in")), key=lambda k: int(k[2:]))


def _moments(d):
    """(mean, cov-or-var, is_vector)"""
    m = jnp.asarray(e_mean(d))
    if m.ndim == 0:
        return m, jnp.asarray(e_var(d)), False
    return m, jnp.asarray(e_cov(d)), True


def _info_form(d):
    """(xi, W) lifted to vector/matrix form — finite for improper carriers."""
    from ..dists.gaussian import (
        AbstractMvNormal,
        as_mv_weighted_mean_precision,
        as_weighted_mean_precision,
    )

    if isinstance(d, AbstractMvNormal):
        f = as_mv_weighted_mean_precision(d)
        return f.xi, f.w
    f = as_weighted_mean_precision(d)
    return jnp.reshape(f.xi, (1,)), jnp.reshape(f.w, (1, 1))


def _flatten_inputs(q, keys):
    """Concatenate input means / block-diag covariances into one vector space."""
    ms, vs, dims, vecs = [], [], [], []
    for k in keys:
        m, v, vec = _moments(q[k])
        if not vec:
            m = m[None]
            v = v[None, None]
        ms.append(m)
        vs.append(v)
        dims.append(m.shape[-1])
        vecs.append(vec)
    mean = jnp.concatenate(ms, axis=-1)
    total = sum(dims)
    cov = jnp.zeros(mean.shape[:-1] + (total, total), mean.dtype)
    off = 0
    for v, d in zip(vs, dims):
        cov = cov.at[..., off:off + d, off:off + d].set(v)
        off += d
    return mean, cov, dims, vecs


def _split_apply(fn, dims, vecs):
    """Wrap fn to take one flat vector."""

    def wrapped(z):
        args = []
        off = 0
        for d, vec in zip(dims, vecs):
            part = z[off:off + d]
            args.append(part if vec else part[0])
            off += d
        out = fn(*args)
        return jnp.atleast_1d(out)

    return wrapped


def _push_linearized(fn_flat, m, v):
    """Linearization: (f(m), J V J^T, J)."""
    f0 = fn_flat(m)
    jac = jax.jacfwd(fn_flat)(m)
    cov = jac @ v @ jac.T
    return f0, _symmetrize(cov), jac


def _psd_guard(v):
    """Lift slightly-indefinite moment matrices to PSD before a cholesky.

    float32 smoother roundoff under extreme vague priors (Q ~ 1/TINY) can
    leave small negative variances on chain marginals; lifting by the most
    negative diagonal entry (plus a scale-aware ridge) keeps the transforms
    finite — a PSD input is perturbed only by the tiny ridge."""
    n = v.shape[-1]
    v = _symmetrize(v)
    diag = jnp.diagonal(v, axis1=-2, axis2=-1)
    # overshoot the lift by 0.1% so the result stays STRICTLY positive
    # definite after float32 rounding (potrf fails on an exactly-zero pivot)
    lift = jnp.maximum(0.0, -jnp.min(diag, axis=-1)) * 1.001
    ridge = 1e-9 * (jnp.abs(jnp.trace(v)) / n + 1e-30)
    return v + (lift + ridge)[..., None, None] * jnp.eye(n, dtype=v.dtype)


def _sigma_points(m, v, alpha, beta, kappa):
    n = m.shape[-1]
    lam = alpha * alpha * (n + kappa) - n
    # static (zero-variance) input dims make v singular; the PSD guard keeps
    # the cholesky finite (sigma points simply don't spread there)
    chol = jnp.linalg.cholesky(_psd_guard((n + lam) * v))
    pts = [m]
    for i in range(n):
        pts.append(m + chol[:, i])
    for i in range(n):
        pts.append(m - chol[:, i])
    pts = jnp.stack(pts, axis=0)
    wm0 = lam / (n + lam)
    wc0 = wm0 + (1 - alpha * alpha + beta)
    wi = 1.0 / (2 * (n + lam))
    wm = jnp.concatenate([jnp.asarray([wm0]), jnp.full((2 * n,), wi)])
    wc = jnp.concatenate([jnp.asarray([wc0]), jnp.full((2 * n,), wi)])
    return pts, wm, wc


def _push_unscented(fn_flat, m, v, params: Unscented):
    pts, wm, wc = _sigma_points(m, v, params.alpha, params.beta, params.kappa)
    ys = jax.vmap(fn_flat)(pts)
    mean = jnp.sum(wm[:, None] * ys, axis=0)
    dy = ys - mean
    cov = jnp.einsum("s,si,sj->ij", wc, dy, dy)
    dz = pts - m
    cross = jnp.einsum("s,si,sj->ij", wc, dz, dy)  # Cov(z, y)
    return mean, _symmetrize(cov), cross


def _push_sampled(fn_flat, m, v, params: CVIProjection):
    """Monte-Carlo moment matching of (z, f(z)) — the CVIProjection transform."""
    n = m.shape[-1]
    key = jax.random.PRNGKey(params.seed)
    chol = jnp.linalg.cholesky(_psd_guard(v))
    eps = jax.random.normal(key, (params.n_samples, n), dtype=m.dtype)
    pts = m + eps @ chol.T
    ys = jax.vmap(fn_flat)(pts)
    mean = jnp.mean(ys, axis=0)
    dy = ys - mean
    cov = dy.T @ dy / params.n_samples
    dz = pts - m
    cross = dz.T @ dy / params.n_samples  # Cov(z, y)
    return mean, _symmetrize(cov), cross


def _ridged_inv(v):
    """Scale-aware ridged symmetric inverse — the shared numeric guard for
    rank-deficient matrices in the delta machinery (ONE formula so the
    cavity-moment and effective-precision paths stay consistent)."""
    n = v.shape[-1]
    r = 1e-8 * (jnp.abs(jnp.trace(v)) / n + 1e-30) + 1e-12
    return _symmetrize(pd_inverse(
        _symmetrize(v) + r * jnp.eye(n, dtype=v.dtype)))


def _robust_moments(d):
    """(mean, cov, is_vector) that stays FINITE for rank-deficient Gaussian
    carriers (e.g. the rank-1-precision cavity a dot factor sends a vector
    variable): moments come from the ridged information form, leaving large
    — not infinite — variance in unconstrained directions."""
    from ..dists.gaussian import AbstractMvNormal, AbstractNormal

    if isinstance(d, (AbstractMvNormal, AbstractNormal)):
        xi, w = _info_form(d)
        v = _ridged_inv(w)
        m = jnp.einsum("...ij,...j->...i", v, xi)
        vec = isinstance(d, AbstractMvNormal)
        if not vec:
            return m[..., 0], v[..., 0, 0], False
        return m, v, True
    return _moments(d)


def _stat_jacobian(fn_flat, z0, v_blk, method):
    """Method-respecting linearization of ``fn_flat`` around N(z0, v_blk):
    the statistical Jacobian J = Cov(z, y)ᵀ V⁻¹ from sigma points
    (Unscented) or samples (CVIProjection) — the statistically-linearized
    filter's regression slope — or the analytic ``jacfwd`` for
    Linearization.  Shapes: (d_out, Σ d_in)."""
    if isinstance(method, Unscented):
        _, _, cross = _push_unscented(fn_flat, z0, v_blk, method)
    elif isinstance(method, CVIProjection):
        _, _, cross = _push_sampled(fn_flat, z0, v_blk, method)
    else:
        return jax.jacfwd(fn_flat)(z0)
    return (_ridged_inv(v_blk) @ cross).T


def _known_inverse_backward(q, target_idx, keys, method, inverse,
                            extra_out_cov=None):
    """Known-inverse shortcut (reference DeltaMeta(inverse=...),
    delta-node.md:60-117).

    The inverse supplies the LINEARIZATION POINT (the IEKF use of a known
    inverse): x₀ = f_back_i(m_out, m_others), and the message to input i is
    the information-form pullback of the out-side belief through the FORWARD
    function's Jacobian at x₀:

        w_msg  = J_iᵀ W_eff J_i,        ξ_msg = w_msg x₀ ,
        W_eff  = (V_out + Σ_{j≠i} J_j V_j J_jᵀ [+ extra_out_cov])⁻¹ .

    Rank-deficient out-side cavities (e.g. the rank-1 message a dot factor
    sends a vector variable) flow through NATURALLY: unconstrained output
    directions contribute exactly zero precision — a direct pushforward of
    the out belief through f⁻¹ would instead fabricate a near-point message
    wherever the inverse's Jacobian vanishes.  ``extra_out_cov`` widens the
    out belief (the contracted NonlinearGaussian path adds its noise).
    Returns None (after a WARNING — never silently) when ``inverse`` cannot
    be applied."""
    fn = _meta(q)["fn"]
    m_out, v_out, out_vec = _robust_moments(q["out"])
    if not out_vec:
        m_out = jnp.reshape(m_out, (1,))
        v_out = jnp.reshape(v_out, (1, 1))
    if extra_out_cov is not None:
        v_out = v_out + extra_out_cov

    single = inverse if callable(inverse) else (
        inverse[0] if len(inverse) == 1 else None)
    usable = (len(keys) == 1 and single is not None) or (
        (not callable(inverse)) and len(inverse) == len(keys) > 1)
    if not usable:
        import warnings

        expected = ("a callable" if len(keys) == 1 else
                    f"a tuple of {len(keys)} callables (one per input, "
                    "reference delta-node.md)")
        warnings.warn(
            f"DeltaMeta(inverse=...) ignored: expected {expected} for a "
            f"{len(keys)}-input delta node; falling back to joint-Gaussian "
            "conditioning.",
            stacklevel=2,
        )
        return None

    moments = []
    for k in keys:
        m_k, v_k, vec_k = _robust_moments(q[k])
        if not vec_k:
            m_k = jnp.reshape(m_k, (1,))
            v_k = jnp.reshape(v_k, (1, 1))
        moments.append((m_k, v_k, vec_k))
    others = [mo for j, mo in enumerate(moments) if j != target_idx]
    vec_i = moments[target_idx][2]
    dims_f = [m.shape[-1] for m, _, _ in moments]
    vecs_f = [v for _, _, v in moments]
    offs = [0]
    for d_k in dims_f:
        offs.append(offs[-1] + d_k)
    fn_flat = _split_apply(fn, dims_f, vecs_f)

    # block-diagonal joint input covariance (for the statistical Jacobians)
    n_in = offs[-1]
    v_blk = jnp.zeros((n_in, n_in), m_out.dtype)
    for j in range(len(keys)):
        v_blk = v_blk.at[offs[j]:offs[j + 1], offs[j]:offs[j + 1]].set(
            moments[j][1])

    # Forward predictive at the CURRENT input means: supplies in-domain
    # values for out directions the cavity does not constrain (a rank-1
    # cavity's null-direction mean is arbitrary; f⁻¹ of it can sit on the
    # forward function's domain boundary, e.g. sqrt at 0).
    z_m = jnp.concatenate([m for m, _, _ in moments], axis=-1)
    y_fwd = jnp.atleast_1d(fn_flat(z_m))
    jac_m = _stat_jacobian(fn_flat, z_m, v_blk, method)
    v_fwd = sum(
        (jac_m[:, offs[j]:offs[j + 1]] @ moments[j][1]
         @ jac_m[:, offs[j]:offs[j + 1]].T)
        for j in range(len(keys))
    )
    w_o = _ridged_inv(v_out)
    w_fwd = _ridged_inv(v_fwd)
    m_out_comb = jnp.linalg.solve(
        w_o + w_fwd, w_o @ m_out + w_fwd @ y_fwd)

    # linearization point from the inverse, at the COMBINED out mean
    if len(keys) == 1:
        inv_flat = _split_apply(single, [m_out.shape[-1]], [out_vec])
        x0 = inv_flat(m_out_comb)
    else:
        inv_fn = inverse[target_idx]
        dims_b = [m_out.shape[-1]] + [m.shape[-1] for m, _, _ in others]
        vecs_b = [out_vec] + [v for _, _, v in others]
        inv_flat = _split_apply(inv_fn, dims_b, vecs_b)
        x0 = inv_flat(jnp.concatenate(
            [m_out_comb] + [m for m, _, _ in others], axis=-1))
    x0 = jnp.atleast_1d(x0)

    # forward Jacobians at (x0, m_others), respecting the method
    parts = []
    oi = 0
    for j in range(len(keys)):
        if j == target_idx:
            parts.append(x0)
        else:
            parts.append(others[oi][0])
            oi += 1
    jac = _stat_jacobian(fn_flat, jnp.concatenate(parts, axis=-1), v_blk,
                         method)
    j_i = jac[:, offs[target_idx]:offs[target_idx + 1]]
    # widen the out belief by the linearized uncertainty of the OTHER inputs
    v_eff = v_out
    oi = 0
    for j in range(len(keys)):
        if j == target_idx:
            continue
        v_eff = v_eff + (jac[:, offs[j]:offs[j + 1]] @ others[oi][1]
                         @ jac[:, offs[j]:offs[j + 1]].T)
        oi += 1
    w_eff = _ridged_inv(v_eff)
    w_msg = _symmetrize(j_i.T @ w_eff @ j_i)
    xi_msg = w_msg @ x0
    if not vec_i:
        return NormalWeightedMeanPrecision(xi_msg[0], w_msg[0, 0])
    return MvNormalWeightedMeanPrecision(xi_msg, w_msg)


@node("Delta")
class DeltaNode:
    """Rules dispatch on the approximation method in the factor meta."""

    # backward rules consume (and divide out) the target input's own marginal
    needs_self_marginal = True
    cavity_cluster = ("out", "in")

    @staticmethod
    @_fp32
    def bethe_term(q):
        """Deterministic-node Bethe contribution −H[q_a] from cavity beliefs:
        the local joint over the random inputs is ∝ Π cav_i(z_i) · cav_out(f(z))
        with precision J = blockdiag(W_i) + JᵀW_out J (first-order pullback of
        the out cavity; static inputs contribute no entropy dimensions).
        Reference: FactorBoundFreeEnergy on Deterministic nodes via the joint
        marginalrule product + CountingReal cancellation."""
        meta = _meta(q)
        fn = meta["fn"]
        keys = _inputs(q)
        ms, dims, rand_slices, w_blocks = [], [], [], []
        off = 0
        for k in keys:
            d = q[k]
            if isinstance(d, PointMass):
                m_k = jnp.atleast_1d(jnp.asarray(d.point))
                ms.append(m_k)
                dims.append(m_k.shape[-1])
                off += m_k.shape[-1]
                continue
            xi_k, w_k = _info_form(d)
            m_k = jnp.linalg.solve(
                w_k + 1e-12 * jnp.eye(w_k.shape[-1]), xi_k
            )
            ms.append(m_k)
            dk = m_k.shape[-1]
            rand_slices.append((off, dk))
            w_blocks.append(w_k)
            dims.append(dk)
            off += dk
        total = off
        m_flat = jnp.concatenate(ms)
        vecs = [jnp.ndim(e_mean(q[k])) >= 1 for k in keys]

        def fn_flat(z):
            args, o = [], 0
            for dk, vec in zip(dims, vecs):
                part = z[o:o + dk]
                args.append(part if vec else part[0])
                o += dk
            return jnp.atleast_1d(jnp.asarray(fn(*args)))

        jac = jax.jacfwd(fn_flat)(m_flat)
        _, w_out = _info_form(q["out"])
        jmat_full = jac.T @ w_out @ jac
        idx = jnp.asarray(
            [o + i for (o, dk) in rand_slices for i in range(dk)]
        )
        jmat = jmat_full[jnp.ix_(idx, idx)]
        o2 = 0
        for (_, dk), w_k in zip(rand_slices, w_blocks):
            jmat = jmat.at[o2:o2 + dk, o2:o2 + dk].add(w_k)
            o2 += dk
        d_rand = int(sum(dk for _, dk in rand_slices))
        if d_rand == 0:
            return jnp.zeros(())
        h = 0.5 * d_rand * 2.837877066409345 - 0.5 * jnp.linalg.slogdet(jmat)[1]
        return -h

    @staticmethod
    @_fp32
    def message_to_out(q):
        meta = _meta(q)
        fn = meta["fn"]
        method = meta.get("method") or Linearization()
        keys = _inputs(q)
        m, v, dims, vecs = _flatten_inputs(q, keys)
        fn_flat = _split_apply(fn, dims, vecs)
        if isinstance(method, Unscented):
            mean, cov, _ = _push_unscented(fn_flat, m, v, method)
        elif isinstance(method, CVIProjection):
            if method.out_family is not None:
                # project the pushed sample cloud onto the requested family
                # (shared M-projection machinery, engine/projection.py)
                from ..engine.projection import fit_weighted_samples

                n = m.shape[-1]
                key = jax.random.PRNGKey(method.seed)
                ridge = 1e-9 * (jnp.trace(v) / n + 1e-30)
                chol = jnp.linalg.cholesky(
                    _symmetrize(v) + ridge * jnp.eye(n, dtype=v.dtype))
                eps = jax.random.normal(key, (method.n_samples, n),
                                        dtype=m.dtype)
                ys = jax.vmap(fn_flat)(m + eps @ chol.T)
                samples = ys[..., 0] if (
                    method.out_family in ("gaussian", "beta", "gamma")
                    and ys.shape[-1] == 1) else ys
                return fit_weighted_samples(
                    method.out_family, samples,
                    jnp.ones((method.n_samples,)))
            mean, cov, _ = _push_sampled(fn_flat, m, v, method)
        else:
            mean, cov, _ = _push_linearized(fn_flat, m, v)
        if mean.shape[-1] == 1:
            return NormalMeanVariance(mean[0], jnp.clip(cov[0, 0], 1e-12))
        # the pushforward of a LOWER-dimensional input is rank-deficient
        # (e.g. scalar x through x*z with a data vector z); a relative ridge
        # keeps the moment-form message invertible for downstream products.
        # Full-rank pushforwards stay unperturbed; rank counts only the
        # RANDOM input dims (PointMass/data inputs carry zero variance).
        d_o = cov.shape[-1]
        d_rand = sum(dk for k, dk in zip(keys, dims)
                     if not isinstance(q[k], PointMass))
        if d_rand < d_o:
            cov = cov + (1e-6 * jnp.abs(jnp.trace(cov)) / d_o
                         + 1e-12) * jnp.eye(d_o, dtype=cov.dtype)
        return MvNormalMeanCovariance(mean, cov)

    @staticmethod
    @_fp32
    def _backward(q, target_idx: int):
        """Message to input ``target_idx`` by joint-Gaussian conditioning:
        approximate the joint of (inputs, out) by the chosen transform, condition
        on the out marginal, then divide out the input's own marginal
        (moment-matched equivalent of the reference's RTS-style delta backward
        pass)."""
        meta = _meta(q)
        fn = meta["fn"]
        method = meta.get("method") or Linearization()
        inverse = meta.get("inverse")
        keys = _inputs(q)

        m_out, v_out, out_vec = _moments(q["out"])
        if not out_vec:
            m_out = m_out[None]
            v_out = jnp.reshape(v_out, (1, 1))

        if inverse is not None:
            msg = _known_inverse_backward(q, target_idx, keys, method,
                                          inverse)
            if msg is not None:
                return msg

        m, v, dims, vecs = _flatten_inputs(q, keys)
        fn_flat = _split_apply(fn, dims, vecs)
        if isinstance(method, Unscented):
            f0, s_yy, s_zy = _push_unscented(fn_flat, m, v, method)
        elif isinstance(method, CVIProjection):
            f0, s_yy, s_zy = _push_sampled(fn_flat, m, v, method)
        else:
            f0, s_yy, jac = _push_linearized(fn_flat, m, v)
            s_zy = v @ jac.T

        # joint-Gaussian conditioning on the (possibly improper) out-side
        # belief, written in information form so a flat or rank-deficient out
        # cavity degrades to a flat message instead of NaN:
        #   K = S_zy (S_yy + W̃^-1)^-1 = S_zy (W̃ S_yy + I)^-1 W̃
        if isinstance(q["out"], PointMass):
            s_total = _symmetrize(s_yy)
            k = jnp.linalg.solve(s_total, s_zy.T).T
            m_post = m + k @ (m_out - f0)
            v_post = _symmetrize(v - k @ s_total @ k.T)
        else:
            xi_o, w_o = _info_form(q["out"])
            g = w_o @ s_yy + jnp.eye(s_yy.shape[-1], dtype=s_yy.dtype)
            wt = jnp.linalg.solve(g, w_o)
            xit = jnp.linalg.solve(g, xi_o - w_o @ f0)
            m_post = m + s_zy @ xit
            v_post = _symmetrize(v - s_zy @ wt @ s_zy.T)

        # Divide the joint-approximate posterior by the input's own prior
        # marginal to obtain the *message* (RxInfer delta nodes emit messages,
        # not marginals): natural-parameter subtraction.
        off = sum(dims[:target_idx])
        d_i = dims[target_idx]
        m_i = m_post[off:off + d_i]
        v_i = v_post[off:off + d_i, off:off + d_i]
        w_post = pd_inverse(v_i)
        xi_post = w_post @ m_i

        q_in = q[keys[target_idx]]
        m_prior, v_prior, vec_i = _moments(q_in)
        if not vec_i:
            m_prior = m_prior[None]
            v_prior = jnp.reshape(v_prior, (1, 1))
        w_prior = pd_inverse(v_prior)
        xi_prior = w_prior @ m_prior

        w_msg = w_post - w_prior
        xi_msg = xi_post - xi_prior
        # guard: keep message proper-ish (tiny positive precision floor)
        if not vec_i:
            return NormalWeightedMeanPrecision(xi_msg[0], w_msg[0, 0])
        return MvNormalWeightedMeanPrecision(xi_msg, w_msg)


def _delta_getattr(name):
    if name.startswith("message_to_in"):
        i = int(name[len("message_to_in"):])
        return batched_delta_rule(lambda q: DeltaNode._backward(q, i))
    raise AttributeError(name)


class _DeltaMeta(type):
    def __getattr__(cls, name):
        return _delta_getattr(name)


DeltaNode = _DeltaMeta("DeltaNode", (DeltaNode,), {})
from .registry import _NODES  # noqa: E402

_NODES["Delta"] = DeltaNode


# =================================================================================
# NonlinearGaussian: out = fn(in0, in1, ...) + noise — the contraction of a Delta
# node feeding a Gaussian mean (the reference's dominant delta pattern:
# y ~ Normal(mean=f(x), var), docs/src/manuals/inference/delta-node.md).
# Backward messages divide the conditioned joint by the input marginal, so for
# linear fn they are EXACT likelihood messages independent of the marginal
# (IEKF/UKF-style iterated relinearization otherwise).
# =================================================================================

from ..dists import GammaShapeRate
from ..dists.matrix import WishartInverseScale


def _ng_noise_cov(q, d_out):
    if "var" in q:
        v = e_mean(q["var"])
        return jnp.reshape(v, (1, 1)) if d_out == 1 else v
    if "cov" in q:
        v = q["cov"].point if isinstance(q["cov"], PointMass) else q["cov"].mean()
        return v
    from .expectations import e_precision

    w = e_precision(q["prec"])
    if jnp.ndim(w) == 0:
        return jnp.reshape(1.0 / w, (1, 1))
    return pd_inverse(w)


class _NonlinearGaussianBase:
    needs_self_marginal = True
    # out and the Gaussian inputs form one BP cluster; noise (var/cov/prec)
    # stays across the mean-field boundary (reference default constraints).
    cavity_cluster = ("out", "in")

    @staticmethod
    def _transform(q):
        meta = _meta(q)
        fn = meta["fn"]
        method = meta.get("method") or Linearization()
        keys = _inputs(q)
        m, v, dims, vecs = _flatten_inputs(q, keys)
        fn_flat = _split_apply(fn, dims, vecs)
        if isinstance(method, Unscented):
            f0, s_yy, s_zy = _push_unscented(fn_flat, m, v, method)
        elif isinstance(method, CVIProjection):
            f0, s_yy, s_zy = _push_sampled(fn_flat, m, v, method)
        else:
            f0, s_yy, jac = _push_linearized(fn_flat, m, v)
            s_zy = v @ jac.T
        return keys, m, v, dims, vecs, f0, s_yy, s_zy

    @classmethod
    @_fp32
    def message_to_out(cls, q):
        _, _, _, _, _, f0, s_yy, _ = cls._transform(q)
        noise = _ng_noise_cov(q, f0.shape[-1])
        cov = s_yy + noise
        if f0.shape[-1] == 1:
            return NormalMeanVariance(f0[0], cov[0, 0])
        return MvNormalMeanCovariance(f0, _symmetrize(cov))

    @classmethod
    @_fp32
    def _backward(cls, q, target_idx: int):
        meta = _meta(q)
        inverse = meta.get("inverse")
        if inverse is not None:
            # known-inverse shortcut on the CONTRACTED node: the out-side
            # belief seen by the delta is the observation message widened by
            # the Gaussian noise, N(m_out, v_out + noise)
            method = meta.get("method") or Linearization()
            keys_i = _inputs(q)
            d_out = jnp.ndim(e_mean(q["out"])) and \
                jnp.shape(e_mean(q["out"]))[-1] or 1
            noise_i = _ng_noise_cov(q, int(d_out))
            msg = _known_inverse_backward(q, target_idx, keys_i, method,
                                          inverse, extra_out_cov=noise_i)
            if msg is not None:
                return msg
        keys, m, v, dims, vecs, f0, s_yy, s_zy = cls._transform(q)
        m_out, v_out, out_vec = _moments(q["out"])
        if not out_vec:
            m_out = jnp.reshape(m_out, (1,))
            v_out = jnp.reshape(v_out, (1, 1))
        noise = _ng_noise_cov(q, f0.shape[-1])
        if isinstance(q["out"], PointMass):
            s_total = _symmetrize(s_yy + noise)
            k = jnp.linalg.solve(s_total, s_zy.T).T
            m_post = m + k @ (m_out - f0)
            v_post = _symmetrize(v - k @ s_total @ k.T)
        else:
            # information-form conditioning: robust to flat/improper out
            # cavities (see DeltaNode._backward)
            xi_o, w_o = _info_form(q["out"])
            s_mat = _symmetrize(s_yy + noise)
            g = w_o @ s_mat + jnp.eye(s_mat.shape[-1], dtype=s_mat.dtype)
            wt = jnp.linalg.solve(g, w_o)
            xit = jnp.linalg.solve(g, xi_o - w_o @ f0)
            m_post = m + s_zy @ xit
            v_post = _symmetrize(v - s_zy @ wt @ s_zy.T)

        off = sum(dims[:target_idx])
        d_i = dims[target_idx]
        m_i = m_post[off:off + d_i]
        v_i = v_post[off:off + d_i, off:off + d_i]
        w_post = pd_inverse(v_i)
        xi_post = w_post @ m_i

        q_in = q[keys[target_idx]]
        m_prior, v_prior, vec_i = _moments(q_in)
        if not vec_i:
            m_prior = jnp.reshape(m_prior, (1,))
            v_prior = jnp.reshape(v_prior, (1, 1))
        w_prior = pd_inverse(v_prior)
        w_msg = w_post - w_prior
        xi_msg = xi_post - w_prior @ m_prior

        if not vec_i:
            return NormalWeightedMeanPrecision(xi_msg[0], w_msg[0, 0])
        return MvNormalWeightedMeanPrecision(xi_msg, w_msg)

    @classmethod
    def _c2(cls, q):
        """E[(out - f(in))(out - f(in))^T] (moment-matched)."""
        _, _, _, _, _, f0, s_yy, _ = cls._transform(q)
        m_out, v_out, out_vec = _moments(q["out"])
        if not out_vec:
            m_out = jnp.reshape(m_out, (1,))
            v_out = jnp.reshape(v_out, (1, 1))
        diff = m_out - f0
        return v_out + s_yy + diff[:, None] * diff[None, :]

    @classmethod
    def average_energy(cls, q):
        c = cls._c2(q)
        d = c.shape[-1]
        noise = _ng_noise_cov(q, d)
        if "prec" in q and not isinstance(q["prec"], PointMass):
            from .expectations import e_log_precision, e_precision

            w = e_precision(q["prec"])
            if jnp.ndim(w) == 0:
                w = jnp.reshape(w, (1, 1))
                elogdet = e_log_precision(q["prec"])
            else:
                from .expectations import e_logdet

                elogdet = e_logdet(q["prec"])
        else:
            w = pd_inverse(noise)
            elogdet = -jnp.linalg.slogdet(noise)[1]
        ld2pi = d * 1.8378770664093453
        return 0.5 * (ld2pi - elogdet + jnp.einsum("ij,ji->", w, c))


def _ng_getattr(name):
    if name.startswith("message_to_in"):
        i = int(name[len("message_to_in"):])
        return batched_delta_rule(lambda q: _NonlinearGaussianBase._backward(q, i))
    raise AttributeError(name)


class _NGMeta(type):
    def __getattr__(cls, name):
        return _ng_getattr(name)


@node("NonlinearGaussianCovariance")
class NonlinearGaussianCovarianceNode(_NonlinearGaussianBase, metaclass=_NGMeta):
    pass


@node("NonlinearGaussianPrecision")
class NonlinearGaussianPrecisionNode(_NonlinearGaussianBase, metaclass=_NGMeta):
    @classmethod
    @_fp32
    def message_to_prec(cls, q):
        c = cls._c2(q)
        if c.shape[-1] == 1:
            c2 = c[0, 0]
            return GammaShapeRate(jnp.full_like(c2, 1.5), 0.5 * c2)
        d = c.shape[-1]
        return WishartInverseScale(jnp.asarray(float(d) + 2.0), c)


# =================================================================================
# Plate batching for delta rules: the single-copy math above is vmapped over the
# plate axis, with per-leaf in_axes inferred from each marginal's event rank
# (class-based).  Unbatched inputs broadcast (in_axes=None).
# =================================================================================

from ..dists import (
    Beta as _Beta,
    GammaShapeRate as _GSR,
    GammaShapeScale as _GSS,
    InverseGamma as _IG,
    InverseWishart as _IW,
    MvNormalMeanCovariance as _MvMC,
    MvNormalMeanPrecision as _MvMP,
    MvNormalWeightedMeanPrecision as _MvWMP,
    NormalMeanPrecision as _NMP,
    NormalMeanVariance as _NMV,
    NormalWeightedMeanPrecision as _NWMP,
    Wishart as _W,
)
from ..dists.gaussian import AbstractMvNormal as _AbstractMv
from ..dists.matrix import WishartInverseScale as _WIS

_LEAF_RANKS = {
    _NMV: (0, 0), _NMP: (0, 0), _NWMP: (0, 0),
    _MvMC: (1, 2), _MvMP: (1, 2), _MvWMP: (1, 2),
    _Beta: (0, 0), _GSR: (0, 0), _GSS: (0, 0), _IG: (0, 0),
    _W: (0, 2), _IW: (0, 2), _WIS: (0, 2),
}


def _dist_axes(d, pm_event_ndim: int):
    """Per-leaf vmap axes for one marginal: 0 where a batch dim exists, else None."""
    import dataclasses as _dc

    if isinstance(d, PointMass):
        ax = 0 if jnp.ndim(d.point) > pm_event_ndim else None
        return PointMass(ax), (0 if ax == 0 else None)
    ranks = _LEAF_RANKS.get(type(d))
    if ranks is None:
        return jax.tree_util.tree_map(lambda _: None, d), None
    fields = [f.name for f in _dc.fields(d)]
    axes = []
    batched = None
    for name, r in zip(fields, ranks):
        leaf = getattr(d, name)
        if jnp.ndim(leaf) > r:
            axes.append(0)
            batched = 0
        else:
            axes.append(None)
    return type(d)(*axes), batched


def _probe_out_vec(meta, q, keys):
    fn = meta["fn"]
    dims, vecs = [], []
    for k in keys:
        d = q[k]
        vec = isinstance(d, _AbstractMv)
        m = jnp.asarray(e_mean(d))
        dims.append(m.shape[-1] if vec else 1)
        vecs.append(vec)
    probes = [
        jnp.zeros((dm,)) if vec else jnp.asarray(0.0)
        for dm, vec in zip(dims, vecs)
    ]
    out = jax.eval_shape(fn, *probes)
    return len(out.shape) >= 1


def batched_delta_rule(fn_single):
    """Wrap a single-copy delta rule so it vmaps over a leading plate axis."""

    def rule(q):
        meta = _meta(q)
        if not meta.get("_plated", True):
            # non-plated factor: no batch axes exist; ndim-1 PointMass inputs
            # are static vectors, not plates of scalars
            return fn_single(q)
        keys = _inputs(q)
        out_vec = (
            _probe_out_vec(meta, q, keys) if "out" in q else False
        )
        dists = {k: v for k, v in q.items() if k != "_meta"}
        axes = {}
        any_batched = False
        for k, d in dists.items():
            if k == "out":
                ev = 1 if out_vec else 0
            elif k.startswith("in"):
                ev = 1 if isinstance(d, _AbstractMv) else 0
            else:
                ev = None  # noise/shared params: never plate-batched
            if ev is None:
                axes[k] = jax.tree_util.tree_map(lambda _: None, d)
            else:
                ax, b = _dist_axes(d, ev)
                axes[k] = ax
                any_batched = any_batched or (b == 0)
        if not any_batched:
            return fn_single(q)
        return jax.vmap(
            lambda dd: fn_single({**dd, "_meta": meta}), in_axes=(axes,)
        )(dists)

    return rule


def _wrap_class_rules(cls):
    for name in list(vars(cls)):
        if name.startswith("message_to_") or name == "average_energy":
            fn = getattr(cls, name)
            setattr(cls, name, staticmethod(batched_delta_rule(fn)))
    return cls


# Apply plate batching to the concrete rule entry points.
DeltaNode.message_to_out = staticmethod(batched_delta_rule(DeltaNode.message_to_out))
# the Bethe contribution batches over plate copies the same way (plated
# deltas under free_energy=True — cvi_tests.jl nonlinear dynamics)
DeltaNode.bethe_term = staticmethod(batched_delta_rule(DeltaNode.bethe_term))
for _cls in (NonlinearGaussianCovarianceNode, NonlinearGaussianPrecisionNode):
    _cls.message_to_out = staticmethod(batched_delta_rule(_cls.message_to_out))
    _cls.average_energy = staticmethod(batched_delta_rule(_cls.average_energy))
NonlinearGaussianPrecisionNode.message_to_prec = staticmethod(
    batched_delta_rule(NonlinearGaussianPrecisionNode.message_to_prec)
)
