"""Bethe free-energy assembly (reference: ReactiveMPFreeEnergyPlugin + score(),
src/model/plugins/reactivemp_free_energy.jl).

FE = Σ_a E_{q_a}[-log f_a]  -  Σ_a H[q_a]  +  Σ_i (d_i - 1) H[q_i]

  * q_a is the factor's local joint: the structured pairwise marginal for chain
    transition factors (Gaussian cross-covariance / discrete xi), mean-field
    product otherwise.
  * Observed/constant interfaces are PointMass: their (infinite) entropies cancel
    exactly per CountingReal semantics — here they are *omitted symbolically at
    compile time* (dists.base.CountingReal documents the accounting), so the XLA
    program only sums finite terms.
  * On a tree at the BP fixed point this equals -log Z, which the test-suite
    cross-checks against the Kalman prediction-error log-evidence.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..dists import PointMass
from ..ops.smallmat import small_inv, small_logdet
from ..dists.gaussian import pd_logdet
from ..graph.ir import Const, Factor, ModelGraph, Ref, SymIndex
from ..rules.registry import get_average_energy
from .blocks import _coverage, build_q, tree_index, tree_slice

_LOG2PIE = 2.837877066409345  # log(2*pi*e)


def _n_copies(f: Factor) -> int:
    """Number of factor copies a (possibly nested-) plated factor stands for."""
    plates = getattr(f, "plates", ()) or ((f.plate,) if f.plate else ())
    n = 1
    for p in plates:
        n *= p.size
    return n


def slot_degrees(graph: ModelGraph, var) -> np.ndarray:
    """Static per-slot degree of a random variable (factor copies per slot)."""
    n = var.length if var.is_array else 1
    deg = np.zeros(n, dtype=np.int64)
    for f in graph.factors:
        for v in f.all_interfaces().values():
            if isinstance(v, Ref) and v.var is var:
                cov = _coverage(f, v)
                copies = _n_copies(f)
                if cov == "grid":
                    # grid latent slot: one factor copy per slot
                    deg[0] += 1
                elif cov is None:
                    # shared (scalar) interface: every factor copy touches it
                    deg[0] += copies
                elif isinstance(cov, int):
                    deg[cov] += 1
                else:
                    # per-slot: copies over the OTHER plate axes of a nested
                    # factor all touch each slot (1 for single-plate factors)
                    per_slot = (
                        copies // v.idx.plate.size
                        if isinstance(v.idx, SymIndex)
                        else 1
                    )
                    deg[cov[0]:cov[1]] += per_slot
    return deg


def gaussian_pair_entropy(covs_out, covs_in, cross_out_in):
    """Entropy of the joint Gaussian (out, in) per pair.

    cross_out_in: Cov(out, in), shape (..., d, d) (or scalar for d=1 chains)."""
    if jnp.ndim(cross_out_in) <= 1:  # scalar chain
        det = covs_out * covs_in - cross_out_in**2
        return _LOG2PIE + 0.5 * jnp.log(det)
    d = covs_out.shape[-1]
    top = jnp.concatenate([covs_out, cross_out_in], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(cross_out_in, -1, -2), covs_in], axis=-1)
    joint = jnp.concatenate([top, bot], axis=-2)
    return d * _LOG2PIE + 0.5 * pd_logdet(joint)


def discrete_pair_entropy(xis):
    """H of pairwise categorical q(out, in): -Σ xi log xi."""
    return -jnp.sum(xis * jnp.log(jnp.clip(xis, 1e-37)), axis=(-2, -1))


# Gaussian factors whose (out, mean) pair forms a BP cluster: with both cavity
# messages stored, AE and the factor entropy are computed from the exact local
# pair joint (the reference's structured FactorBoundFreeEnergy over
# q(out, mean); noise stays across the mean-field split).
_GAUSS_PAIR_NOISE = {
    "NormalMeanVariance": "var",
    "NormalMeanPrecision": "prec",
    "MvNormalMeanCovariance": "cov",
    "MvNormalMeanPrecision": "prec",
}
_NG_PAIR = {"NonlinearGaussianCovariance", "NonlinearGaussianPrecision"}
_DOT_PAIR = {"GaussianDotCovariance", "GaussianDotPrecision"}


def _as_vec_nat(d):
    """(xi, W) of a Gaussian carrier lifted to vector/matrix form."""
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


def _noise_expectations(q, noise_key, d):
    """(E[V^-1] a.k.a. W̄ as a (d,d) matrix, E[log det V])."""
    noise = q[noise_key]
    if noise_key in ("var",):
        if isinstance(noise, PointMass):
            w = 1.0 / noise.point
            elogv = jnp.log(noise.point)
        else:
            w = noise.mean_inverse()
            elogv = noise.mean_log()
        return jnp.reshape(w, (1, 1)), elogv
    if noise_key == "cov":
        if isinstance(noise, PointMass):
            from ..dists.gaussian import pd_inverse

            return pd_inverse(noise.point), pd_logdet(noise.point)
        return noise.mean_inverse(), noise.mean_logdet()
    # precision parametrization
    from ..rules.expectations import e_log_precision, e_logdet, e_precision

    w = e_precision(noise)
    if jnp.ndim(w) == 0:
        elogv = -(
            jnp.log(noise.point)
            if isinstance(noise, PointMass)
            else e_log_precision(noise)
        )
        return jnp.reshape(w, (1, 1)), elogv
    elogv = -(
        pd_logdet(noise.point) if isinstance(noise, PointMass) else e_logdet(noise)
    )
    return w, elogv


def gaussian_pair_fe(f: Factor, q: dict, state: dict, in_key: str,
                     noise_key: str) -> jnp.ndarray:
    """AE − H over the exact local joint q(out, in) of a (possibly nonlinear)
    Gaussian factor out = g(in) + noise, reconstructed from cavity messages.

    cavities: nat(q) − nat(stored message); local joint precision
    J = [[W_o + W̄, −W̄A], [−AᵀW̄, W_i + AᵀW̄A]] with (A, b) the (linearized)
    observation map.  Exact for linear g — on trees this makes FE == −log Z.
    Noise-side entropies stay mean-field (reference default constraints)."""
    from ..dists.natural import nat_div
    from ..rules.expectations import e_mean

    cav_out = nat_div(q["out"], state[f"_msg:{f.id}:out"])
    cav_in = nat_div(q[in_key], state[f"_msg:{f.id}:{in_key}"])
    xi_o, w_o = _as_vec_nat(cav_out)
    xi_i, w_i = _as_vec_nat(cav_in)
    d_o = xi_o.shape[-1]
    d_i = xi_i.shape[-1]

    # observation map out = A @ in + b (+ noise)
    meta = f.meta or {}
    fn = meta.get("fn")
    if "A" in q and isinstance(q["A"], PointMass):
        a_mat = jnp.reshape(jnp.asarray(q["A"].point), (d_o, d_i))
        b_q = q.get("b")
        b_vec = (
            jnp.reshape(jnp.asarray(b_q.point), (d_o,))
            if isinstance(b_q, PointMass)
            else jnp.zeros((d_o,))
        )
    elif fn is None:
        a_mat = jnp.eye(d_o)
        b_vec = jnp.zeros((d_o,))
    else:
        import jax

        m_i = jnp.asarray(e_mean(q[in_key]))
        m_flat = jnp.reshape(m_i, (d_i,))
        scalar_in = jnp.ndim(m_i) == 0

        def fn_flat(z):
            return jnp.reshape(
                jnp.asarray(fn(z[0] if scalar_in else z)), (d_o,)
            )

        a_mat = jax.jacfwd(fn_flat)(m_flat)
        b_vec = fn_flat(m_flat) - a_mat @ m_flat

    wbar, elogv = _noise_expectations(q, noise_key, d_o)

    # joint natural parameters over (out, in)
    top = jnp.concatenate([w_o + wbar, -wbar @ a_mat], axis=-1)
    bot = jnp.concatenate(
        [-a_mat.T @ wbar, w_i + a_mat.T @ wbar @ a_mat], axis=-1
    )
    jmat = jnp.concatenate([top, bot], axis=-2)
    xi = jnp.concatenate([xi_o + wbar @ b_vec, xi_i - a_mat.T @ wbar @ b_vec])

    vmat = small_inv(jmat)
    mu = vmat @ xi
    mu_o, mu_i = mu[:d_o], mu[d_o:]
    v_oo = vmat[:d_o, :d_o]
    v_oi = vmat[:d_o, d_o:]
    v_ii = vmat[d_o:, d_o:]

    err = mu_o - a_mat @ mu_i - b_vec
    cov_err = v_oo - v_oi @ a_mat.T - a_mat @ v_oi.T + a_mat @ v_ii @ a_mat.T
    c2 = cov_err + err[:, None] * err[None, :]
    ae = 0.5 * (
        d_o * 1.8378770664093453
        + elogv
        + jnp.einsum("ij,ji->", wbar, c2)
    )
    h_pair = 0.5 * (d_o + d_i) * _LOG2PIE - 0.5 * small_logdet(jmat)
    term = ae - h_pair
    # noise entropy (mean-field boundary), if the noise is a random variable
    noise = q.get(noise_key)
    if noise is not None and not isinstance(noise, PointMass):
        v = f.interfaces.get(noise_key)
        if isinstance(v, Ref) and v.var.kind == "random":
            term = term - jnp.sum(noise.entropy())
    return term


def _extract_affine_transition(f: Factor, event_shape=None):
    """Probe a custom lagged-transition node's ``message_to_out`` rule for an
    affine-Gaussian conditional  out | in ~ N(A·in + b, Q) — scalar AND
    vector states (round 5 extends the round-4 scalar probe per the
    reference default joint q(x_t, x_{t-1}),
    constraints-specification.md:107-292).

    The probe runs at FE-plan build time with concrete PointMass cavities
    (d+2 probes for d-dimensional states: the zero point, the d basis
    vectors, and a validation point); affinity of the mean and
    input-independence of the (co)variance are validated on the host.
    Returns ``(A, b, Q)`` — floats for scalar states, float32 arrays for
    vector states — or None when the rule is not affine-Gaussian (the FE
    then keeps the mean-field bound)."""
    import jax

    from ..rules.registry import get_message_rule

    try:
        rule = get_message_rule(f.fform, "out")
        in_ref = f.interfaces.get("in")
        # event shapes live on CompiledModel.infos (GroupInfo), passed in by
        # the FE builder; the Variable attribute is a fallback
        ev = event_shape
        if ev is None:
            ev = getattr(in_ref.var, "event_shape", None) or ()
        if len(ev) > 1:
            return None
        vector = len(ev) == 1
        d_i = int(ev[0]) if vector else 1

        def probe(x):
            q = {"in": PointMass(jnp.asarray(x, jnp.float32))}
            for name, v in f.interfaces.items():
                if name != "in" and isinstance(v, Const):
                    q[name] = PointMass(jnp.asarray(v.value, jnp.float32))
            if f.meta is not None:
                q["_meta"] = {**f.meta, "_plated": f.plate is not None}
            msg = rule(q)
            if vector:
                return (np.asarray(msg.mean(), np.float64),
                        np.asarray(msg.cov(), np.float64))
            return float(msg.mean()), float(msg.var())

        # the FE plan may be built lazily INSIDE a jit trace; the probe must
        # evaluate eagerly on concrete values regardless
        with jax.ensure_compile_time_eval():
            if not vector:
                xs = (0.37, -1.21, 2.05)
                ms, vs = zip(*(probe(x) for x in xs))
                a = (ms[0] - ms[1]) / (xs[0] - xs[1])
                b = ms[0] - a * xs[0]
                if not np.isclose(ms[2], a * xs[2] + b, rtol=1e-5, atol=1e-6):
                    return None
                if not (np.isclose(vs[0], vs[1], rtol=1e-6)
                        and np.isclose(vs[0], vs[2], rtol=1e-6)):
                    return None
                if not vs[0] > 0:
                    return None
                return float(a), float(b), float(vs[0])

            b_vec, q0 = probe(np.zeros(d_i, np.float32))
            if b_vec.shape != (d_i,) or q0.shape != (d_i, d_i):
                return None  # dimension-changing transitions: mean-field FE
            cols, covs = [], []
            for j in range(d_i):
                e = np.zeros(d_i, np.float32)
                e[j] = 1.0
                mj, vj = probe(e)
                cols.append(mj - b_vec)
                covs.append(vj)
            a_mat = np.stack(cols, axis=1)                  # (d, d)
            x_t = np.linspace(-1.3, 2.05, d_i).astype(np.float32)
            mt, vt = probe(x_t)
            if not np.allclose(mt, a_mat @ x_t + b_vec, rtol=1e-5,
                               atol=1e-5):
                return None
            for v in covs + [vt]:
                if not np.allclose(v, q0, rtol=1e-6, atol=1e-8):
                    return None
            np.linalg.cholesky(q0)  # PD check (raises -> None)
            return (np.asarray(a_mat, np.float32),
                    np.asarray(b_vec, np.float32),
                    np.asarray(q0, np.float32))
    except Exception:  # noqa: BLE001 — any probe failure: mean-field FE
        return None


class FactorFE:
    """Per-factor free-energy contribution evaluator (compiled once)."""

    def __init__(self, factor: Factor, is_chain_transition: bool,
                 chain_scalar: bool, mean_field: bool = False,
                 event_shape=None):
        self.factor = factor
        self.is_chain_transition = is_chain_transition
        self.chain_scalar = chain_scalar
        self.mean_field = mean_field
        from ..rules.registry import get_node

        # Deterministic (delta) nodes have no average energy; their whole Bethe
        # contribution is -H[q_a] of the joint belief over the node's inputs
        # (reference: FactorBoundFreeEnergy on Deterministic nodes — the joint
        # is the marginalrule product of inbound messages; the delta's infinite
        # AE/entropy parts cancel per CountingReal semantics).  Such nodes
        # declare ``bethe_term(q_cavities)`` instead of ``average_energy``.
        self.bethe_fn = getattr(get_node(factor.fform), "bethe_term", None)
        self.energy_fn = (
            None if self.bethe_fn is not None else get_average_energy(factor.fform)
        )
        # Custom lagged-transition factors (the Jacobi chain fallback,
        # engine/compile.py detect_chains): when the node's out-rule probes as
        # affine-Gaussian, the FE uses the exact pair joint reconstructed from
        # the stored cavity messages instead of the mean-field bound — FE then
        # equals −log Z on custom tree chains (reference default
        # q(x_t, x_{t-1}) joint, constraints-specification.md:107-292).
        self.custom_pair = None
        f = factor
        in_ref = f.interfaces.get("in")
        if (
            not is_chain_transition
            and not mean_field
            and f.plate is not None
            and isinstance(in_ref, Ref)
            and f.out.var.kind == "random"
            and f.out.var is in_ref.var
        ):
            from ..rules.registry import get_node
            from .blocks import in_cavity_cluster

            node_cls = get_node(f.fform)
            if (in_cavity_cluster(node_cls, "out")
                    and in_cavity_cluster(node_cls, "in")):
                self.custom_pair = _extract_affine_transition(f, event_shape)
        # Structured (out, in) pair treatment — see gaussian_pair_fe.
        self.pair = None
        if (
            not is_chain_transition
            and not mean_field
            and f.plate is None
            and f.out.var.kind == "random"
        ):
            if f.fform in _GAUSS_PAIR_NOISE:
                mean_ref = f.interfaces.get("mean")
                if isinstance(mean_ref, Ref) and mean_ref.var.kind == "random":
                    self.pair = ("mean", _GAUSS_PAIR_NOISE[f.fform])
            elif f.fform in _DOT_PAIR:
                in_ref = f.interfaces.get("in")
                if isinstance(in_ref, Ref) and in_ref.var.kind == "random":
                    self.pair = (
                        "in", "var" if "var" in f.interfaces else "prec"
                    )
            elif f.fform in _NG_PAIR:
                in_keys = [k for k in f.interfaces if k.startswith("in")]
                rand_ins = [
                    k
                    for k in in_keys
                    if isinstance(f.interfaces[k], Ref)
                    and f.interfaces[k].var.kind == "random"
                ]
                if len(in_keys) == 1 and len(rand_ins) == 1:
                    noise_key = (
                        "var"
                        if "var" in f.interfaces
                        else ("cov" if "cov" in f.interfaces else "prec")
                    )
                    self.pair = (rand_ins[0], noise_key)

    def _call_bethe_term(self, state, data, chain_cross):
        """Structured delta-node contribution from cavity (inbound) messages."""
        from ..dists.natural import nat_div

        f = self.factor
        n_copies = f.plate.size if f.plate is not None else 1
        q = build_q(f, state, data, chain_cross=chain_cross)
        for name, v in f.all_interfaces().items():
            key = f"_msg:{f.id}:{name}"
            if (
                name in q
                and key in state
                and isinstance(v, Ref)
                and v.var.kind == "random"
            ):
                q[name] = nat_div(q[name], state[key])
        term = self.bethe_fn(q)
        if jnp.ndim(term) == 0 and n_copies > 1:
            term = term * n_copies
        return jnp.sum(term)

    def _custom_pair_fe(self, state, data):
        """Structured pair FE for a custom affine-Gaussian lagged transition
        at the Jacobi fixed point: the pair joint q(out_t, in_t) ∝
        cav_out·cav_in·N(out; A·in + b, Q) is reconstructed per copy from the
        stored cavity messages; AE and the pair entropy are closed-form in
        (A, b, Q), so FE == −log Z on trees.  (The node's own average_energy
        is bypassed — the message rules define the factor density.)"""
        from ..dists.gaussian import as_weighted_mean_precision
        from ..dists.natural import nat_div

        f = self.factor
        a_c, b_c, q_c = self.custom_pair
        q = build_q(f, state, data, chain_cross=None)
        cav_o = nat_div(q["out"], state[f"_msg:{f.id}:out"])
        cav_i = nat_div(q["in"], state[f"_msg:{f.id}:in"])
        if np.ndim(a_c) == 2:
            return self._custom_pair_fe_mv(cav_o, cav_i)
        no = as_weighted_mean_precision(cav_o)
        ni = as_weighted_mean_precision(cav_i)
        joo = no.w + 1.0 / q_c
        jii = ni.w + a_c * a_c / q_c
        joi = -a_c / q_c
        xo = no.xi + b_c / q_c
        xi_ = ni.xi - a_c * b_c / q_c
        det = joo * jii - joi * joi
        voo = jii / det
        vii = joo / det
        c = -joi / det
        mo = (jii * xo - joi * xi_) / det
        mi = (joo * xi_ - joi * xo) / det
        resid = mo - a_c * mi - b_c
        ae = 0.5 * (jnp.log(2 * jnp.pi * q_c)
                    + (resid**2 + voo + a_c * a_c * vii - 2 * a_c * c) / q_c)
        h = gaussian_pair_entropy(voo, vii, c)
        return jnp.sum(ae - h)

    def _custom_pair_fe_mv(self, cav_o, cav_i):
        """Vector-state variant of ``_custom_pair_fe``: per plate copy the
        pair joint q(out, in) ∝ cav_out·cav_in·N(out; A·in + b, Q) in block
        information form; AE + pair entropy closed-form in (A, b, Q)."""
        from ..dists.gaussian import as_mv_weighted_mean_precision

        a_c, b_c, q_c = self.custom_pair
        A = jnp.asarray(a_c)
        b = jnp.asarray(b_c)
        Qinv = jnp.linalg.inv(jnp.asarray(q_c))
        logdet_q = jnp.linalg.slogdet(jnp.asarray(q_c))[1]
        d = A.shape[0]
        no = as_mv_weighted_mean_precision(cav_o)   # .xi (P, d), .w (P, d, d)
        ni = as_mv_weighted_mean_precision(cav_i)
        joo = no.w + Qinv
        jii = ni.w + A.T @ Qinv @ A
        joi = jnp.broadcast_to(-(Qinv @ A), joo.shape)
        jmat = jnp.concatenate([
            jnp.concatenate([joo, joi], axis=-1),
            jnp.concatenate([jnp.swapaxes(joi, -1, -2), jii], axis=-1),
        ], axis=-2)                                  # (P, 2d, 2d)
        xo = no.xi + Qinv @ b
        xi_ = ni.xi - A.T @ (Qinv @ b)
        xi_full = jnp.concatenate([xo, xi_], axis=-1)
        vmat = jnp.linalg.inv(jmat)
        mu = jnp.einsum("...ij,...j->...i", vmat, xi_full)
        mo, mi = mu[..., :d], mu[..., d:]
        voo = vmat[..., :d, :d]
        voi = vmat[..., :d, d:]
        vii = vmat[..., d:, d:]
        resid = mo - jnp.einsum("ij,...j->...i", A, mi) - b
        cov_err = (
            voo
            - jnp.einsum("...ik,jk->...ij", voi, A)
            - jnp.einsum("ik,...jk->...ij", A, voi)
            + jnp.einsum("ik,...kl,jl->...ij", A, vii, A)
        )
        c2 = cov_err + resid[..., :, None] * resid[..., None, :]
        ae = 0.5 * (
            d * jnp.log(2 * jnp.pi) + logdet_q
            + jnp.einsum("ij,...ji->...", Qinv, c2)
        )
        h = 0.5 * 2 * d * _LOG2PIE - 0.5 * jnp.linalg.slogdet(jmat)[1]
        return jnp.sum(ae - h)

    def __call__(self, state, data, chain_cross):
        if self.bethe_fn is not None:
            return self._call_bethe_term(state, data, chain_cross)
        f = self.factor
        if (
            self.custom_pair is not None
            and f"_msg:{f.id}:out" in state
            and f"_msg:{f.id}:in" in state
        ):
            return self._custom_pair_fe(state, data)
        if (
            f.fform == "GCV"
            and not self.is_chain_transition
            and not self.mean_field
            and f.plate is None
            and f"_msg:{f.id}:out" in state
            and f"_msg:{f.id}:in" in state
        ):
            # structured single-step GCV: AE over the joint q(out, in)
            # (build_q attaches the cavity-reconstructed cross) and the PAIR
            # entropy replaces the two individual entropies — the reference
            # HGF constraint q(xt, zt, xt_min) = q(xt, xt_min)q(zt)
            q = build_q(f, state, data, chain_cross=None)
            ae = jnp.sum(self.energy_fn(q))
            h = jnp.sum(gaussian_pair_entropy(
                q["out"].var(), q["in"].var(), q["joint"]
            ))
            for name in ("z", "kappa", "omega"):
                qv = q.get(name)
                v = f.interfaces.get(name)
                if (
                    qv is not None and not isinstance(qv, PointMass)
                    and isinstance(v, Ref) and v.var.kind == "random"
                ):
                    h = h + jnp.sum(qv.entropy())
            return ae - h
        if self.pair is not None:
            in_key, noise_key = self.pair
            if (
                f"_msg:{f.id}:out" in state
                and f"_msg:{f.id}:{in_key}" in state
            ):
                q = build_q(f, state, data, chain_cross=None)
                return gaussian_pair_fe(f, q, state, in_key, noise_key)
        from .blocks import _grid, factor_data_mask

        grid = _grid(f)
        n_copies = _n_copies(f)
        q = build_q(f, state, data, chain_cross=chain_cross)
        ae = self.energy_fn(q)
        # Missing-data correction: removing an unobserved likelihood factor
        # changes FE by exactly -AE_a (its entropy term cancels against the
        # degree decrement), so masking AE alone is exact.
        mask = factor_data_mask(f, data)
        if mask is not None:
            ae = ae * mask
        if grid is not None:
            # nested-plate factor: the energy stands for the full copy grid
            ae = jnp.broadcast_to(ae, grid + jnp.shape(ae)[len(grid):])
        # A plated factor with only shared/scalar interfaces yields a scalar
        # energy that stands for plate.size copies.
        elif jnp.ndim(ae) == 0 and n_copies > 1:
            ae = ae * n_copies
        ae = jnp.sum(ae)

        # factor-local entropy H[q_a]
        if self.is_chain_transition:
            name = f.out.var.name
            cross = chain_cross[name]
            q_out, q_in = q["out"], q["in"]
            if f.fform == "DiscreteTransition":
                h = jnp.sum(discrete_pair_entropy(cross))
            elif f.fform == "AR":
                if self.chain_scalar:
                    # univariate AR (order=1, scalar latents): plain scalar
                    # pair (out, in) — reference ARMeta(Univariate, ...)
                    h = jnp.sum(
                        gaussian_pair_entropy(q_out.var(), q_in.var(), cross)
                    )
                else:
                    # AR transition is degenerate in the embedded state
                    # (shift rows); the effective cluster is (out_0, in) of
                    # dim k+1.
                    v00 = q_out.cov()[..., 0:1, 0:1]
                    c0 = cross[..., 0:1, :]
                    h = jnp.sum(
                        gaussian_pair_entropy(v00, q_in.cov(), c0)
                    )
            else:
                h = jnp.sum(
                    gaussian_pair_entropy(
                        q_out.var() if self.chain_scalar else q_out.cov(),
                        q_in.var() if self.chain_scalar else q_in.cov(),
                        cross,
                    )
                )
        else:
            h = 0.0
            for name, v in f.all_interfaces().items():
                qv = q.get(name)
                if qv is None or isinstance(qv, PointMass):
                    continue
                if isinstance(v, Ref) and v.var.kind == "random":
                    hv = qv.entropy()
                    cov = _coverage(f, v)
                    # shared interface of a plated factor → one copy per slot
                    if f.plate is not None and cov is None:
                        hv = hv * n_copies
                    elif grid is not None and isinstance(v.idx, SymIndex):
                        # each slot of a single-axis neighbor participates in
                        # every copy along the other grid axes
                        hv = hv * (n_copies // v.idx.plate.size)
                    h = h + jnp.sum(hv)
        return ae - h


def variable_entropy_term(graph: ModelGraph, state, degrees: dict,
                          only=None):
    """Σ_i (d_i - 1) H[q_i] over random variables (per slot).

    PointMass marginals (form-constrained) contribute zero — their -inf
    entropies cancel against the factor-side terms per CountingReal semantics.
    ``only``: restrict to the named variables (the plain part of the composed
    mixture-FE decomposition)."""
    total = 0.0
    for var in graph.random_variables():
        if only is not None and var.name not in only:
            continue
        q = state[var.name]
        if isinstance(q, PointMass):
            continue
        h = q.entropy()
        deg = degrees[var.name]
        if var.is_array:
            total = total + jnp.sum((jnp.asarray(deg, jnp.float32) - 1.0) * h)
        else:
            total = total + (float(deg[0]) - 1.0) * jnp.sum(h)
    return total
