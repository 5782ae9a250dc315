"""Benchmark: LGSSM message-update throughput on one chip.

Primary metric (BASELINE.json): message updates/sec/chip on LGSSM d=4, T=10k,
exact smoothing.  Following the reference's accounting (SURVEY.md §6: ≈2 messages
+ 1 marginal per latent per step), one smoothed timestep = 3 message updates.

Baseline: the reference's closest published number is LGSSM d=2 smoothing
T=10,000 in 901.667 ms on an Apple M4 Max single thread (BASELINE.md) —
11.09k steps/s ≈ 33.27k message updates/s.  vs_baseline reports our
updates/sec against that number (our workload is d=4, i.e. strictly harder).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time

import numpy as np


def _median_time(fn, n=3, inner=20):
    """Per-call time by the two-point slope method, synced by a scalar FETCH.

    ``fn`` must return a scalar device array reducing over every output of the
    benched program (so nothing is dead-code-eliminated).  The sync point is
    ``np.asarray`` of that scalar: under remote-execution backends (axon
    tunnel) ``jax.block_until_ready`` can return before the computation has
    actually finished, so a device-to-host value fetch is the only trustworthy
    barrier.  The fixed per-fetch round-trip latency (~25 ms through the
    tunnel) is cancelled by timing two pipelined batches of different lengths
    (``inner`` and ``3*inner``) and taking the slope — robust even when the
    program runs faster than the RTT jitter (no subtraction underflow)."""
    float(np.asarray(fn()))  # warm + compile

    def batch(k):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = fn()
            float(np.asarray(out))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_small = batch(inner)
    t_large = batch(3 * inner)
    return max((t_large - t_small) / (2 * inner), 1e-9)


def _scalarize(program):
    """Wrap a jittable program so it returns one scalar depending on every
    output leaf (keeps all compute alive under jit while making the result
    cheap to fetch through the tunnel)."""
    import jax
    import jax.numpy as jnp

    def wrapped(*args):
        out = program(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        return sum(
            (jnp.sum(x if jnp.issubdtype(x.dtype, jnp.floating)
                     else x.astype(jnp.float32)) for x in leaves),
            start=jnp.float32(0.0),
        )

    return wrapped


def main():
    import jax
    import jax.numpy as jnp

    from rxinfer_tpu.dists.gaussian import pd_inverse
    from rxinfer_tpu.ops.kalman import ChainParams, parallel_smoother
    from rxinfer_tpu.parallel.filtering import FilterState, filtering_scan

    d = 4
    T = 10_000
    theta = np.pi / 35
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
        dtype=np.float32,
    )
    f_mat = np.kron(np.eye(d // 2, dtype=np.float32), rot)
    h = 1.3 * np.eye(d, dtype=np.float32)
    r = np.eye(d, dtype=np.float32)
    q = np.eye(d, dtype=np.float32)
    m0 = np.zeros(d, np.float32)
    p0 = 25.0 * np.eye(d, dtype=np.float32)

    rng = np.random.default_rng(0)
    y = rng.standard_normal((T, d)).astype(np.float32)

    rinv = np.linalg.inv(r)
    w_obs = (h.T @ rinv @ h).astype(np.float32)
    xi = (y @ (h.T @ rinv).T).astype(np.float32)

    params = ChainParams(
        jnp.asarray(m0),
        jnp.asarray(p0),
        jnp.broadcast_to(jnp.asarray(f_mat), (T - 1, d, d)),
        jnp.zeros((T - 1, d)),
        jnp.broadcast_to(jnp.asarray(q), (T - 1, d, d)),
        jnp.asarray(xi),
        jnp.broadcast_to(jnp.asarray(w_obs), (T, d, d)),
    )

    smooth = jax.jit(_scalarize(lambda p: parallel_smoother(p)[:2]))
    t_single = _median_time(lambda: smooth(params))
    updates_per_sec = 3 * T / t_single

    # --- extras -------------------------------------------------------------
    # batched smoothing: 64 chains at once (amortized per-chip throughput)
    B = 64
    yb = rng.standard_normal((B, T, d)).astype(np.float32)
    xib = jnp.einsum("ij,btj->bti", jnp.asarray((h.T @ rinv).astype(np.float32)), yb)
    pb = ChainParams(
        jnp.broadcast_to(jnp.asarray(m0), (B, d)),
        jnp.broadcast_to(jnp.asarray(p0), (B, d, d)),
        jnp.broadcast_to(jnp.asarray(f_mat), (B, T - 1, d, d)),
        jnp.zeros((B, T - 1, d)),
        jnp.broadcast_to(jnp.asarray(q), (B, T - 1, d, d)),
        xib,
        jnp.broadcast_to(jnp.asarray(w_obs), (B, T, d, d)),
    )
    # native leading-batch axis (NOT vmap: the SoA scans fold (B, T) onto full
    # (sublane, lane) tiles; vmap would waste them — ops/kalman.py)
    bsmooth = jax.jit(_scalarize(lambda p: parallel_smoother(p)[:2]))
    t_batch = _median_time(lambda: bsmooth(pb), n=3, inner=5)
    batched_updates_per_sec = 3 * T * B / t_batch

    # fused Pallas batched RTS smoother (ops/pallas_smoother.py): VMEM-resident
    # chain state, streamed moments; B=64 matches the batched64 workload above,
    # B=1024 shows the saturated large-batch regime
    from rxinfer_tpu.ops.pallas_smoother import fused_batched_smoother

    w_sm = jnp.asarray(w_obs)
    xib_t = jnp.moveaxis(xib, 0, 1)  # (T, B, d)
    m0b = jnp.zeros((B, d))
    p0b = jnp.broadcast_to(jnp.asarray(p0), (B, d, d))
    fsm = jax.jit(_scalarize(lambda xi: fused_batched_smoother(
        m0b, p0b, xi, f_mat, np.zeros(d, np.float32), q, w_obs, chunk=8)[:2]))
    t_fsm = _median_time(lambda: fsm(xib_t), n=3, inner=3)
    fused_b64_updates_per_sec = 3 * T * B / t_fsm

    B2 = 1024
    xi2 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (T, B2, d)))()
    jax.block_until_ready(xi2)
    m0b2 = jnp.zeros((B2, d))
    p0b2 = jnp.broadcast_to(jnp.asarray(p0), (B2, d, d))
    fsm2 = jax.jit(_scalarize(lambda xi: fused_batched_smoother(
        m0b2, p0b2, xi, f_mat, np.zeros(d, np.float32), q, w_obs, chunk=8)[:2]))
    t_fsm2 = _median_time(lambda: fsm2(xi2), n=3, inner=3)
    fused_b1024_updates_per_sec = 3 * T * B2 / t_fsm2

    # streaming filtering over 10k parallel chains (BASELINE config 5)
    BF, TF = 10_000, 200
    ys = jnp.asarray(rng.standard_normal((TF, BF, d)).astype(np.float32))
    jax.block_until_ready(ys)  # pre-stage on device: time compute, not PCIe
    state = FilterState(
        jnp.zeros((BF, d)), jnp.broadcast_to(jnp.asarray(p0), (BF, d, d))
    )
    filt = jax.jit(_scalarize(
        lambda st, ys: filtering_scan(st, ys, jnp.asarray(f_mat), jnp.asarray(q),
                                      jnp.asarray(h), jnp.asarray(r))
    ))
    t_filt = _median_time(lambda: filt(state, ys), n=3, inner=3)
    filter_updates_per_sec = BF * TF / t_filt

    # fused Pallas VMEM-resident filter on SoA-staged observations (the layout
    # a continuous-batching producer maintains) — ops/pallas_filter.py
    from rxinfer_tpu.dists.gaussian import pd_inverse as _pd_inverse
    from rxinfer_tpu.ops.pallas_filter import (
        _fold_batch, batch_pad, fused_filter_soa,
    )

    bp = batch_pad(BF)
    rinv_j = _pd_inverse(jnp.asarray(r))
    w_obs_j = jnp.einsum("ji,jk,kl->il", h, rinv_j, h).astype(jnp.float32)
    hr_j = jnp.einsum("ji,jk->ik", h, rinv_j).astype(jnp.float32)
    m0_soa = _fold_batch(state.m.astype(jnp.float32), bp)
    p0_soa = _fold_batch(state.p.astype(jnp.float32), bp)
    p0_soa = p0_soa.reshape((d * d,) + p0_soa.shape[2:])
    ys_soa = jnp.moveaxis(_fold_batch(jnp.moveaxis(ys, 0, -1), bp), 1, 0)
    jax.block_until_ready(ys_soa)
    fused = jax.jit(_scalarize(lambda yss: fused_filter_soa(
        m0_soa, p0_soa, yss, jnp.asarray(f_mat), jnp.asarray(q),
        hr_j, w_obs_j, chunk=8,
    )))
    t_fused = _median_time(lambda: fused(ys_soa), n=3, inner=3)
    fused_filter_updates_per_sec = BF * TF / t_fused

    # --- BASELINE config 4: GMM clustering batched over 1k datasets ----------
    from rxinfer_tpu.dists import Dirichlet, GammaShapeRate, NormalMeanVariance
    from rxinfer_tpu.engine.compile import CompiledModel
    from rxinfer_tpu.models import zoo

    BG, NG, IT_G = 1000, 200, 20
    comp_g = rng.uniform(size=(BG, NG)) < 0.4
    yg = np.where(comp_g, 4.0 + 0.5 * rng.standard_normal((BG, NG)),
                  -1.0 + 0.7 * rng.standard_normal((BG, NG))).astype(np.float32)
    init_g = {
        "m0": NormalMeanVariance(-2.0, 10.0),
        "m1": NormalMeanVariance(2.0, 10.0),
        "w0": GammaShapeRate(1.0, 1.0), "w1": GammaShapeRate(1.0, 1.0),
        "pi": Dirichlet(np.ones(2, dtype=np.float32)),
    }
    gmm_graph = zoo.gmm(2, [-2.0, 2.0]).trace({"y": yg[0]})
    gmm_prog = CompiledModel(gmm_graph, init=init_g).make_program(
        iterations=IT_G, free_energy=False, keep_each=False
    )
    yg_dev = jnp.asarray(yg)
    gmm_batched = jax.jit(_scalarize(jax.vmap(lambda y: gmm_prog({"y": y})[0])))
    t_gmm = _median_time(lambda: gmm_batched(yg_dev), n=3, inner=3)
    # marginal updates per sweep: n latent assignments + 5 parameters
    gmm_updates_per_sec = BG * IT_G * (NG + 5) / t_gmm

    # --- BASELINE config 3: HMM structured mean-field VMP (batched 256) ------
    from rxinfer_tpu.dists import DirichletCollection

    BH, TH, IT_H = 256, 200, 20
    a_true = np.array([[0.9, 0.05, 0.05], [0.05, 0.9, 0.05],
                       [0.05, 0.05, 0.9]], np.float64)
    yh = np.zeros((BH, TH), np.int64)
    for bidx in range(BH):
        s = rng.integers(3)
        for t in range(TH):
            s = rng.choice(3, p=a_true[:, s])
            yh[bidx, t] = rng.choice(3, p=a_true[:, s])
    yh1 = np.eye(3, dtype=np.float32)[yh]
    init_h = {
        "A": DirichletCollection(np.full((3, 3), 1.0, np.float32)),
        "B": DirichletCollection(np.float32(np.eye(3) * 5.0 + 1.0)),
    }
    hmm_graph = zoo.hmm(3, 3).trace({"y": yh1[0]})
    hmm_prog = CompiledModel(hmm_graph, init=init_h).make_program(
        iterations=IT_H, free_energy=False, keep_each=False
    )
    yh_dev = jnp.asarray(yh1)
    hmm_batched = jax.jit(_scalarize(jax.vmap(lambda y: hmm_prog({"y": y})[0])))
    t_hmm = _median_time(lambda: hmm_batched(yh_dev), n=3, inner=3)
    hmm_updates_per_sec = BH * IT_H * (TH + 2) / t_hmm

    baseline_updates_per_sec = 3 * 10_000 / 0.901667  # reference d=2 T=10k CPU

    print(json.dumps({
        "metric": "LGSSM d=4 T=10k smoothing message updates/sec/chip",
        "value": round(updates_per_sec, 1),
        "unit": "updates/s",
        "vs_baseline": round(updates_per_sec / baseline_updates_per_sec, 2),
        "single_chain_ms": round(t_single * 1e3, 3),
        "batched64_updates_per_sec": round(batched_updates_per_sec, 1),
        "batched64_vs_baseline": round(
            batched_updates_per_sec / baseline_updates_per_sec, 2
        ),
        "batched64_fused_pallas_updates_per_sec": round(
            fused_b64_updates_per_sec, 1
        ),
        "batched1024_fused_pallas_updates_per_sec": round(
            fused_b1024_updates_per_sec, 1
        ),
        "batched1024_fused_vs_baseline": round(
            fused_b1024_updates_per_sec / baseline_updates_per_sec, 2
        ),
        "streaming_filter_10k_chains_state_updates_per_sec": round(
            filter_updates_per_sec, 1
        ),
        "streaming_filter_fused_pallas_state_updates_per_sec": round(
            fused_filter_updates_per_sec, 1
        ),
        "gmm_1k_datasets_vmp_updates_per_sec": round(gmm_updates_per_sec, 1),
        "hmm_256x200_structured_vmp_updates_per_sec": round(
            hmm_updates_per_sec, 1
        ),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
