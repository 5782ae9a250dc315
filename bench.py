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


def _median_time(prog, args, n=3):
    """Per-call device time of ``prog(*args) -> scalar``, measured by an
    ON-DEVICE repetition loop + two-point slope, synced by a scalar FETCH.

    Why this shape (learned the hard way on the axon tunnel):
    - ``jax.block_until_ready`` can return before the computation finishes
      under remote execution, so the only trustworthy barrier is a
      device-to-host fetch of a scalar that depends on every output.
    - A HOST-side repetition loop measures dispatch RTT (~25 ms/call jitter
      through the tunnel), not device time — fast programs swung >10x between
      runs.  Repetition therefore goes INSIDE the jitted program as a
      ``lax.fori_loop`` whose iterations are serialized by threading the
      accumulated scalar back into the inputs (a ``+ acc*1e-30`` perturbation
      XLA cannot fold away), so k iterations = k real executions.
    - The fixed fetch latency is cancelled by timing k and 3k iterations and
      taking the slope.
    """
    import jax
    import jax.numpy as jnp

    def looped(k, *args):
        def body(_, acc):
            eps = acc * jnp.float32(1e-30)
            perturbed = jax.tree_util.tree_map(
                lambda a: a + eps.astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                args,
            )
            return acc + prog(*perturbed)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    run = jax.jit(looped)

    def timed(k):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(np.asarray(run(k, *args)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    float(np.asarray(run(1, *args)))  # warm + compile
    t1 = timed(2) / 2.0               # RTT-inflated estimate, upper bound
    k = int(min(2000, max(4, 0.5 / max(t1, 1e-7))))
    t_small = timed(k)
    t_large = timed(3 * k)
    return max((t_large - t_small) / (2 * k), 1e-9)


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
    import os

    import jax
    import jax.numpy as jnp

    # persistent compile cache: every program here recompiles through the
    # remote-compile tunnel (20-120 s each) otherwise; verified effective
    # under the axon backend
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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

    smooth = _scalarize(lambda p: parallel_smoother(p)[:2])
    t_single = _median_time(smooth, (params,))
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
    bsmooth = _scalarize(lambda p: parallel_smoother(p)[:2])
    t_batch = _median_time(bsmooth, (pb,))
    batched_updates_per_sec = 3 * T * B / t_batch

    # fused Pallas batched RTS smoother (ops/pallas_smoother.py): VMEM-resident
    # chain state, streamed moments; B=64 matches the batched64 workload above,
    # B=1024 shows the saturated large-batch regime
    from rxinfer_tpu.ops.pallas_smoother import fused_batched_smoother

    xib_t = jnp.moveaxis(xib, 0, 1)  # (T, B, d)
    m0b = jnp.zeros((B, d))
    p0b = jnp.broadcast_to(jnp.asarray(p0), (B, d, d))
    # perturb the SMALL arg (m0) between device-loop iterations: perturbing
    # the big xi array would add a full copy pass per iteration
    fsm = _scalarize(lambda m0x: fused_batched_smoother(
        m0x, p0b, xib_t, f_mat, np.zeros(d, np.float32), q, w_obs, chunk=8)[:2])
    t_fsm = _median_time(fsm, (m0b,))
    fused_b64_updates_per_sec = 3 * T * B / t_fsm

    B2 = 1024
    xi2 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (T, B2, d)))()
    jax.block_until_ready(xi2)
    m0b2 = jnp.zeros((B2, d))
    p0b2 = jnp.broadcast_to(jnp.asarray(p0), (B2, d, d))
    # perturb the BIG xi array between device-loop iterations — the engine
    # measurement below necessarily perturbs its same-sized y input, so the
    # ops ceiling must pay the identical per-iteration copy pass or the
    # engine/ops ratio charges the engine for a measurement artifact
    fsm2 = _scalarize(lambda xi_in: fused_batched_smoother(
        m0b2, p0b2, xi_in, f_mat, np.zeros(d, np.float32), q, w_obs,
        chunk=8)[:2])
    t_fsm2 = _median_time(fsm2, (xi2,))
    fused_b1024_updates_per_sec = 3 * T * B2 / t_fsm2

    # --- PRIMARY: the same B=1024 workload THROUGH THE ENGINE ----------------
    # rx.batched_program / rx.infer_batched lower the model's chain block to
    # the fused kernel (engine/batched.py): evidence xi assembled by the
    # model's own message rules (vmapped einsums over y), chain solved by the
    # Pallas smoother, posteriors extracted from engine state.  This is the
    # number a user gets from the single entry point.
    import rxinfer_tpu as rx
    from rxinfer_tpu.models import zoo

    gen_lgssm = zoo.lgssm(f_mat, q, h, r, m0, p0)
    y2 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (B2, T, d)))()
    jax.block_until_ready(y2)
    _, eng_prog = rx.batched_program(
        gen_lgssm, {"y": np.zeros((B2, T, d), np.float32)},
        iterations=1, free_energy=False,
    )
    eng = _scalarize(lambda ys: eng_prog({"y": ys})[0])
    t_eng = _median_time(eng, (y2,))
    engine_b1024_updates_per_sec = 3 * T * B2 / t_eng

    # --- roofline accounting for the fused B=1024 row (round-4 verdict 5) ---
    # Modeled LOWER-BOUND HBM traffic per call: xi read; filtered means
    # (fp32) write+read; filtered sym covs (moment dtype) write+read;
    # smoothed means write + reduction read; smoothed sym covs and cross
    # writes.  Working-set re-reads inside the kernel are not modeled, so
    # the true traffic (and utilization) is higher.
    HBM_PEAK = 819e9  # TPU v5e: 819 GB/s per chip

    def _smoother_bytes(t_len, b_sz, dim, mdt_bytes):
        sym = dim * (dim + 1) // 2
        per_tb = (
            dim * 4            # xi read
            + 3 * dim * 4      # filtered means w+r, smoothed means w
            + dim * 4          # reduction read of smoothed means
            + 2 * sym * mdt_bytes   # filtered covs w+r
            + sym * mdt_bytes       # smoothed covs write
            + sym * mdt_bytes       # reduction read of smoothed covs
            + dim * dim * mdt_bytes  # cross write
        )
        return t_len * b_sz * per_tb

    bytes_fp32 = _smoother_bytes(T, B2, d, 4)
    hbm_bytes_per_sec = bytes_fp32 / t_eng
    hbm_utilization = hbm_bytes_per_sec / HBM_PEAK

    # --- bf16 moment streaming through the ENGINE (round-4 verdict 5) -------
    # options={"fused_moment_dtype": "bfloat16"}: the kernel streams its
    # HBM-resident covariance/cross moments in bf16 (arithmetic stays fp32)
    _, eng_prog_bf16 = rx.batched_program(
        gen_lgssm, {"y": np.zeros((B2, T, d), np.float32)},
        iterations=1, free_energy=False,
        options={"fused_moment_dtype": "bfloat16"},
    )
    eng_bf16 = _scalarize(lambda ys: eng_prog_bf16({"y": ys})[0])
    t_eng_bf16 = _median_time(eng_bf16, (y2,))
    engine_bf16_updates_per_sec = 3 * T * B2 / t_eng_bf16

    # --- int8 quantized observation ingest through the ENGINE (round-5) -----
    # options={"observation_dtype": "int8"}: observations are quantized once
    # per program (ops/quantized.py row kernels); every sweep's linear-
    # evidence einsum reads the 1-byte payload + per-row scales instead of
    # the fp32 observations.  At iterations=1 the quantize pass ~cancels the
    # ingest saving; the VMP regime (iterations=10) is where the per-sweep
    # re-read saving shows.
    _, eng_prog_i8 = rx.batched_program(
        gen_lgssm, {"y": np.zeros((B2, T, d), np.float32)},
        iterations=1, free_energy=False,
        options={"observation_dtype": "int8"},
    )
    eng_i8 = _scalarize(lambda ys: eng_prog_i8({"y": ys})[0])
    t_eng_i8 = _median_time(eng_i8, (y2,))
    engine_i8_updates_per_sec = 3 * T * B2 / t_eng_i8

    # --- strict-fp32 accuracy mode cost (round-4 verdict weak item 5) -------
    # options={"matmul_precision": "highest"}: every MXU pass runs full-fp32
    # instead of the default bf16-ish fast path; this row quantifies what
    # the accuracy mode costs on the headline workload
    _, eng_prog_strict = rx.batched_program(
        gen_lgssm, {"y": np.zeros((B2, T, d), np.float32)},
        iterations=1, free_energy=False,
        options={"matmul_precision": "highest"},
    )
    t_eng_strict = _median_time(
        _scalarize(lambda ys: eng_prog_strict({"y": ys})[0]), (y2,))

    # --- DYNAMIC fused tier: unknown observation precision (round-5) --------
    # y[t] ~ MvNormal(x[t], precision=Wr) with LATENT Wr ~ Wishart: the
    # evidence precision is re-closed from q(Wr) every sweep and streamed
    # into the kernel as traced per-chain tiles (engine/batched.py dynamic
    # plans).  Through round 4 this flagship unknown-noise shape fell back
    # to the vmapped XLA scan path; the rows quantify the recovered
    # kernel-tier throughput and the speedup over that scan path (measured
    # at a reduced shape — the scan path at B=1024, T=10k costs minutes).
    from rxinfer_tpu.dists import Wishart as _WishartDist

    nu0_dyn = float(d) + 1.0

    @rx.model
    def lgssm_wtau(y):
        Tn = len(y)
        Wr = rx.Wishart(nu0_dyn, np.eye(d, dtype=np.float32))
        x = rx.latent(Tn, name="x")
        x[0] = rx.MvNormal(mean=m0, cov=p0)
        for t in rx.plate(1, Tn):
            x[t] = rx.MvNormal(mean=f_mat @ x[t - 1], cov=q)
        for t in rx.plate(Tn):
            y[t] = rx.MvNormal(mean=x[t], precision=Wr)

    init_dyn = {"Wr": _WishartDist(nu0_dyn, np.eye(d, dtype=np.float32))}
    IT_DYN = 2   # >=2 sweeps: the per-sweep re-closure runs inside lax.scan
    compiled_dyn, dyn_prog = rx.batched_program(
        lgssm_wtau, {"y": np.zeros((B2, T, d), np.float32)},
        iterations=IT_DYN, free_energy=False, initialization=init_dyn,
    )
    assert compiled_dyn.plan_report()["x"].get("dynamic") == ["W"], (
        compiled_dyn.plan_report())
    t_dyn = _median_time(_scalarize(lambda ys: dyn_prog({"y": ys})[0]),
                         (y2,))
    dyn_engine_updates_per_sec = IT_DYN * 3 * T * B2 / t_dyn

    B3, T3 = 256, 2048
    y3 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(7), (B3, T3, d)))()
    jax.block_until_ready(y3)
    _, dyn_prog_s = rx.batched_program(
        lgssm_wtau, {"y": np.zeros((B3, T3, d), np.float32)},
        iterations=IT_DYN, free_energy=False, initialization=init_dyn,
    )
    _, scan_prog_s = rx.batched_program(
        lgssm_wtau, {"y": np.zeros((B3, T3, d), np.float32)},
        iterations=IT_DYN, free_energy=False, initialization=init_dyn,
        options={"fused_kernels": False, "warn": False},
    )
    t_dyn_s = _median_time(
        _scalarize(lambda ys: dyn_prog_s({"y": ys})[0]), (y3,))
    t_scan_s = _median_time(
        _scalarize(lambda ys: scan_prog_s({"y": ys})[0]), (y3,))
    st_dyn = dyn_prog_s({"y": y3})[0]
    st_scan = scan_prog_s({"y": y3})[0]
    dyn_vs_scan_err = float(jnp.max(jnp.abs(
        st_dyn["x"].mean() - st_scan["x"].mean())))

    IT_Q = 10
    _, eng_prog_it = rx.batched_program(
        gen_lgssm, {"y": np.zeros((B2, T, d), np.float32)},
        iterations=IT_Q, free_energy=False,
    )
    _, eng_prog_it_i8 = rx.batched_program(
        gen_lgssm, {"y": np.zeros((B2, T, d), np.float32)},
        iterations=IT_Q, free_energy=False,
        options={"observation_dtype": "int8"},
    )
    t_it = _median_time(_scalarize(lambda ys: eng_prog_it({"y": ys})[0]),
                        (y2,))
    t_it_i8 = _median_time(
        _scalarize(lambda ys: eng_prog_it_i8({"y": ys})[0]), (y2,))

    # --- kernel-level dequant+matmul speed-of-light (BASELINE mandate) ------
    # xi = dequant(vals, scales) @ W^T at a fat ingest shape (dy=16 obs ->
    # dx=4 state).  Minimal HBM traffic: int8 payload read + scale read +
    # fp32 xi write; speed-of-light fraction = achieved/819 GB/s.  Both the
    # Pallas kernel and the XLA-fused equivalent are measured; the better
    # one is the achieved number (XLA may win on lane-starved tiny-K shapes
    # — that is a result, not a failure).
    from rxinfer_tpu.ops.quantized import dequant_matmul, quantize_rows

    RQ, DYQ, DXQ = 1 << 21, 16, 4
    yq = jax.jit(lambda: 3.0 * jax.random.normal(
        jax.random.PRNGKey(2), (RQ, DYQ)))()
    valsq, scalesq = jax.jit(quantize_rows)(yq)
    wq = jnp.asarray(rng.standard_normal((DYQ, DXQ)).astype(np.float32))
    jax.block_until_ready((valsq, scalesq, wq))
    # |out| (not Σout) keeps the measurement honest: a LINEAR reduction of a
    # matmul distributes — XLA strength-reduces Σ_rj(dequant(v,s)@W) into an
    # O(R) dot and the "kernel" time collapses to the timing floor (observed)
    dq_pl = lambda s: jnp.sum(jnp.abs(
        dequant_matmul(valsq, s, wq, block_b=4096)))
    t_dq_pl = _median_time(dq_pl, (scalesq,))
    dq_xla = lambda s: jnp.sum(jnp.abs(jnp.einsum(
        "rf,fj->rj", valsq.astype(jnp.float32) * s, wq,
        preferred_element_type=jnp.float32)))
    t_dq_xla = _median_time(dq_xla, (scalesq,))
    t_dq = min(t_dq_pl, t_dq_xla)
    dq_bytes = RQ * (DYQ * 1 + 4 + DXQ * 4)
    int8_dequant_bytes_per_sec = dq_bytes / t_dq
    fp32_equiv_bytes = RQ * (DYQ * 4 + DXQ * 4)

    # evidence INGEST at the engine's own shape (B=1024, T=10k, d=4): the
    # per-sweep xi einsum reading the 1-byte payload + per-(chain,channel)
    # scales vs reading the fp32 observations.  Both variants perturb a
    # SMALL fp32 arg (scales / the E matrix); the big payload stays staged.
    E_ing = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32))
    y2_bft = jnp.swapaxes(y2, 1, 2)                      # (B, d, T)
    valsE, scalesE = jax.jit(
        lambda a: quantize_rows(a.reshape(-1, T)))(y2_bft)
    valsE = valsE.reshape(B2, d, T)
    scalesE = scalesE.reshape(B2, d, 1)
    jax.block_until_ready((valsE, scalesE))
    ing_i8 = lambda sc: jnp.sum(jnp.abs(jnp.einsum(
        "if,bft->tbi", E_ing, valsE.astype(jnp.float32) * sc,
        preferred_element_type=jnp.float32)))
    t_ing_i8 = _median_time(ing_i8, (scalesE,))
    ing_f32 = lambda Em: jnp.sum(jnp.abs(jnp.einsum(
        "if,btf->tbi", Em, y2, preferred_element_type=jnp.float32)))
    t_ing_f32 = _median_time(ing_f32, (E_ing,))

    # streaming filtering over 10k parallel chains (BASELINE config 5)
    BF, TF = 10_000, 200
    ys = jnp.asarray(rng.standard_normal((TF, BF, d)).astype(np.float32))
    jax.block_until_ready(ys)  # pre-stage on device: time compute, not PCIe
    state = FilterState(
        jnp.zeros((BF, d)), jnp.broadcast_to(jnp.asarray(p0), (BF, d, d))
    )
    filt = _scalarize(
        lambda st: filtering_scan(st, ys, jnp.asarray(f_mat), jnp.asarray(q),
                                  jnp.asarray(h), jnp.asarray(r))
    )
    t_filt = _median_time(filt, (state,))
    filter_updates_per_sec = BF * TF / t_filt

    # fused Pallas VMEM-resident filter on SoA-staged observations (the layout
    # a continuous-batching producer maintains) — ops/pallas_filter.py
    from rxinfer_tpu.dists.gaussian import pd_inverse as _pd_inverse
    from rxinfer_tpu.ops.pallas_filter import (
        _fold_batch, batch_pad, fused_filter_soa, sym_fold,
    )

    bp = batch_pad(BF)
    rinv_j = _pd_inverse(jnp.asarray(r))
    w_obs_j = jnp.einsum("ji,jk,kl->il", h, rinv_j, h).astype(jnp.float32)
    hr_j = jnp.einsum("ji,jk->ik", h, rinv_j).astype(jnp.float32)
    m0_soa = _fold_batch(state.m.astype(jnp.float32), bp)
    p0_soa = sym_fold(state.p.astype(jnp.float32), bp)
    ys_soa = jnp.moveaxis(_fold_batch(jnp.moveaxis(ys, 0, -1), bp), 1, 0)
    jax.block_until_ready(ys_soa)
    fused = _scalarize(lambda m0s: fused_filter_soa(
        m0s, p0_soa, ys_soa, jnp.asarray(f_mat), jnp.asarray(q),
        hr_j, w_obs_j, chunk=8,
    ))
    t_fused = _median_time(fused, (m0_soa,))
    fused_filter_updates_per_sec = BF * TF / t_fused

    # round-5: the same 10k-chain continuous-batched stream through the USER-
    # FACING streaming engine — rx.infer(autoupdates=, mesh=Mesh(..,("dp",)))
    # + run_offline: one jitted scan of the vmapped per-tick program, batch
    # axis shard_mapped over the mesh (1 real chip here; the 8-device CPU
    # path is validated by tests/parallel/test_streaming_mesh.py and dryrun
    # stage 7)
    import rxinfer_tpu as rx
    from jax.sharding import Mesh as _Mesh

    @rx.model
    def _stream_tick(y, pm, pc):
        x = rx.MvNormal(mean=pm, cov=pc)
        y.observe(rx.MvNormal(mean=x, cov=r))
        return {"x": x}

    au_s = rx.autoupdates(
        initial={"pm": np.zeros((BF, d), np.float32),
                 "pc": np.broadcast_to(p0, (BF, d, d)).copy()},
        pm=lambda qq: jnp.einsum(
            "ij,bj->bi", jnp.asarray(f_mat), qq["x"].mean()),
        pc=lambda qq: jnp.einsum(
            "ij,bjk,lk->bil", jnp.asarray(f_mat), qq["x"].cov(),
            jnp.asarray(f_mat)) + jnp.asarray(q),
    )
    mesh_s = _Mesh(np.asarray(jax.devices()[:1]), ("dp",))
    eng_s = rx.infer(model=_stream_tick, datastream=None, autoupdates=au_s,
                     mesh=mesh_s, options={"warn": False})
    eng_s.run_offline({"y": ys})  # compile + establish the cached program
    pm0 = jnp.asarray(au_s.initial["pm"])
    pc0 = jnp.asarray(au_s.initial["pc"])
    # round-5 fused stream plan: the probed linear-Gaussian tick runs the
    # whole stream through the entrywise filter machine
    assert ("fstream",) in eng_s._jitted, "fused stream plan did not engage"
    fn_s = eng_s._jitted[("fstream",)]
    stream_eng = _scalarize(lambda y, pm, pc: fn_s(y, pm, pc)[:2])
    t_stream_eng = _median_time(stream_eng, (ys, pm0, pc0))
    streaming_engine_updates_per_sec = BF * TF / t_stream_eng

    # the GENERIC vmapped-tick path (returnvars= disables the fused plan):
    # what any non-filtering streaming model gets
    eng_g = rx.infer(model=_stream_tick, datastream=None, autoupdates=au_s,
                     mesh=mesh_s, options={"warn": False},
                     returnvars="x")
    eng_g.run_offline({"y": ys})
    fn_g = eng_g._jitted[("boffline", 1, False, True)]
    stream_gen = _scalarize(
        lambda y, pm, pc: fn_g({"y": y}, {"pm": pm, "pc": pc})[1:])
    t_stream_gen = _median_time(stream_gen, (ys, pm0, pc0))
    streaming_engine_generic_updates_per_sec = BF * TF / t_stream_gen

    # --- BASELINE config 4: GMM clustering batched over 1k datasets ----------
    from rxinfer_tpu.dists import Dirichlet, GammaShapeRate, NormalMeanVariance

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
    _, gmm_prog = rx.batched_program(
        zoo.gmm(2, [-2.0, 2.0]), {"y": yg}, iterations=IT_G,
        free_energy=False, initialization=init_g,
    )
    yg_dev = jnp.asarray(yg)
    gmm_batched = _scalarize(lambda y: gmm_prog({"y": y})[0])
    t_gmm = _median_time(gmm_batched, (yg_dev,))
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
    # through the engine: the discrete chain block dispatches into the fused
    # forward-backward kernel with per-step xi streaming (engine/batched.py)
    _, hmm_prog = rx.batched_program(
        zoo.hmm(3, 3), {"y": yh1}, iterations=IT_H, free_energy=False,
        initialization=init_h,
    )
    yh_dev = jnp.asarray(yh1)
    hmm_batched = _scalarize(lambda y: hmm_prog({"y": y})[0])
    t_hmm = _median_time(hmm_batched, (yh_dev,))
    hmm_updates_per_sec = BH * IT_H * (TH + 2) / t_hmm

    # ops-level fused HMM VMP: same workload, inner forward-backward solved by
    # the Pallas kernel (ops/pallas_discrete.py), conjugate Dirichlet updates
    # in XLA around it
    from jax.scipy.special import digamma

    from rxinfer_tpu.ops.pallas_discrete import fused_fb_batched

    y_t_dev = jnp.moveaxis(yh_dev, 0, 1)             # (T, B, K)
    a0_h = jnp.full((BH, 3, 3), 1.0)
    b0_h = jnp.asarray(np.broadcast_to(
        np.eye(3) * 5.0 + 1.0, (BH, 3, 3)).astype(np.float32))
    lp_h = jnp.zeros((BH, 3))

    def _elog(c):
        return digamma(c) - digamma(jnp.sum(c, axis=1, keepdims=True))

    def hmm_fused(y_t):
        def body(_, carry):
            ca, cb = carry
            le = jnp.einsum("tbo,bok->tbk", y_t, _elog(cb))
            g, xi, _ = fused_fb_batched(lp_h, _elog(ca), le, chunk=32)
            return a0_h + xi, b0_h + jnp.einsum("tbo,tbk->bok", y_t, g)
        ca, cb = jax.lax.fori_loop(0, IT_H, body, (a0_h, b0_h))
        return ca, cb

    hmm_fused_s = _scalarize(hmm_fused)
    t_hmm_f = _median_time(hmm_fused_s, (y_t_dev,))
    hmm_fused_updates_per_sec = BH * IT_H * (TH + 2) / t_hmm_f

    # like-for-like kernel loop: per_step_xi=True (the variant the ENGINE
    # must use — per-step pairwise stats feed the chain pair-entropy FE and
    # structured transition updates, reference parity).  The xi-sum variant
    # above is the lighter output contract and overstates the ceiling for
    # the engine's workload.
    def hmm_fused_ps(y_t):
        def body(_, carry):
            ca, cb = carry
            le = jnp.einsum("tbo,bok->tbk", y_t, _elog(cb))
            g, _, _, xis = fused_fb_batched(lp_h, _elog(ca), le, chunk=32,
                                            per_step_xi=True)
            return a0_h + jnp.sum(xis, axis=0), \
                b0_h + jnp.einsum("tbo,tbk->bok", y_t, g)
        return jax.lax.fori_loop(0, IT_H, body, (a0_h, b0_h))

    t_hmm_ps = _median_time(_scalarize(hmm_fused_ps), (y_t_dev,))
    hmm_fused_ps_updates_per_sec = BH * IT_H * (TH + 2) / t_hmm_ps

    # --- d=16 story (round-4 verdict 6): engine + ops-ceiling rows ----------
    # d > 8 runs the batched XLA associative-scan path whose per-step algebra
    # is the closed-form Schur inverse tier extended to d<=16
    # (ops/smallmat.py 8|rest splits — branch-free batched arithmetic, no LU
    # pivot loops).
    D16, B16, T16 = 16, 16, 10_000  # B=64 OOMs HBM: scan element trees are O(B*T*d^2)
    rot16 = np.kron(np.eye(D16 // 2, dtype=np.float32), rot)
    h16 = 1.3 * np.eye(D16, dtype=np.float32)
    r16 = np.eye(D16, dtype=np.float32)
    q16 = np.eye(D16, dtype=np.float32)
    m016 = np.zeros(D16, np.float32)
    p016 = 25.0 * np.eye(D16, dtype=np.float32)
    gen16 = zoo.lgssm(rot16, q16, h16, r16, m016, p016)
    y16 = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(2), (B16, T16, D16)))()
    jax.block_until_ready(y16)
    _, eng16_prog = rx.batched_program(
        gen16, {"y": np.zeros((B16, T16, D16), np.float32)},
        iterations=1, free_energy=False, options={"warn": False},
    )
    eng16 = _scalarize(lambda ys: eng16_prog({"y": ys})[0])
    t_eng16 = _median_time(eng16, (y16,))
    d16_engine_updates_per_sec = 3 * T16 * B16 / t_eng16

    # round-5: d=16 FUSED Pallas kernel tier (the entrywise machine's Schur
    # recursion is d-generic; chunk=1 keeps the backward pass inside VMEM;
    # moments fit HBM at T=2048, B=1024)
    T16F, B16F = 2048, 1024
    y16f = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(5), (B16F, T16F, D16)))()
    jax.block_until_ready(y16f)
    _, eng16f_prog = rx.batched_program(
        gen16, {"y": np.zeros((B16F, T16F, D16), np.float32)},
        iterations=1, free_energy=False, options={"warn": False},
    )
    eng16f = _scalarize(lambda ys: eng16f_prog({"y": ys})[0])
    t_eng16f = _median_time(eng16f, (y16f,))
    d16_fused_engine_updates_per_sec = 3 * T16F * B16F / t_eng16f

    rinv16 = np.linalg.inv(r16)
    w16 = (h16.T @ rinv16 @ h16).astype(np.float32)
    xi16 = jnp.einsum("ij,btj->bti",
                      jnp.asarray((h16.T @ rinv16).astype(np.float32)), y16)
    p16 = ChainParams(
        jnp.broadcast_to(jnp.asarray(m016), (B16, D16)),
        jnp.broadcast_to(jnp.asarray(p016), (B16, D16, D16)),
        jnp.broadcast_to(jnp.asarray(rot16), (B16, T16 - 1, D16, D16)),
        jnp.zeros((B16, T16 - 1, D16)),
        jnp.broadcast_to(jnp.asarray(q16), (B16, T16 - 1, D16, D16)),
        xi16,
        jnp.broadcast_to(jnp.asarray(w16), (B16, T16, D16, D16)),
    )
    # round-5: d<=16 now rides the SoA batch-minor scan path natively
    # (leading batch axes supported; lanes = T)
    ops16 = _scalarize(lambda p: parallel_smoother(p)[:2])
    t_ops16 = _median_time(ops16, (p16,))
    d16_ops_updates_per_sec = 3 * T16 * B16 / t_ops16

    # d=16 accuracy vs a float64 oracle (short chain; same engine path)
    TA16, BA16 = 64, 2
    ya16 = rng.standard_normal((BA16, TA16, D16)).astype(np.float32)
    posts16, _ = rx.infer_batched(gen16, {"y": ya16}, iterations=1,
                                  options={"warn": False})
    fm16 = np.asarray(posts16["x"].mean())

    def _np_rts_generic(dd, f64, q64, h64, r64, m0i, p0i, yi):
        mf, pf = [], []
        m, p = m0i.astype(np.float64), p0i.astype(np.float64)
        for t in range(yi.shape[0]):
            if t > 0:
                m = f64 @ m
                p = f64 @ p @ f64.T + q64
            s_t = h64 @ p @ h64.T + r64
            innov = yi[t].astype(np.float64) - h64 @ m
            k = p @ h64.T @ np.linalg.inv(s_t)
            m = m + k @ innov
            p = p - k @ h64 @ p
            mf.append(m.copy())
            pf.append(p.copy())
        ms = [None] * yi.shape[0]
        ms[-1] = mf[-1]
        for t in range(yi.shape[0] - 2, -1, -1):
            ppred = f64 @ pf[t] @ f64.T + q64
            g = pf[t] @ f64.T @ np.linalg.inv(ppred)
            ms[t] = mf[t] + g @ (ms[t + 1] - f64 @ mf[t])
        return np.stack(ms)

    d16_err = float(max(
        np.abs(fm16[i] - _np_rts_generic(
            D16, rot16.astype(np.float64), q16.astype(np.float64),
            h16.astype(np.float64), r16.astype(np.float64),
            m016.astype(np.float64), p016.astype(np.float64), ya16[i],
        )).max()
        for i in range(BA16)))

    # --- time-sharded rx.infer path (round-4 verdict 1) ---------------------
    # One T=100k chain through infer(mesh=Mesh(..., ("time",))) — on the
    # single real chip this measures the shard_map + distributed-scan
    # formulation's overhead vs the local smoother (multi-chip speedups are
    # validated structurally by dryrun_multichip on virtual meshes).
    from jax.sharding import Mesh

    from rxinfer_tpu.engine.compile import CompiledModel

    TS = 100_000
    ys_l = rng.standard_normal((TS, d)).astype(np.float32)
    gen_long = zoo.lgssm(f_mat, q, h, r, m0, p0)
    mesh_t1 = Mesh(np.asarray(jax.devices()[:1]), ("time",))
    cm_t = CompiledModel(gen_long.trace({"y": ys_l}), time_mesh=mesh_t1)
    cm_l = CompiledModel(gen_long.trace({"y": ys_l}))
    prog_t = _scalarize(lambda y_: cm_t.make_program(1, False, False)(
        {"y": y_})[0])
    prog_l = _scalarize(lambda y_: cm_l.make_program(1, False, False)(
        {"y": y_})[0])
    y_l_dev = jnp.asarray(ys_l)
    tt = _median_time(prog_t, (y_l_dev,))
    tl = _median_time(prog_l, (y_l_dev,))
    time_sharded_updates_per_sec = 3 * TS / tt
    time_sharded_vs_local = tl / tt

    baseline_updates_per_sec = 3 * 10_000 / 0.901667  # reference d=2 T=10k CPU

    # --- accuracy anchor: the ENGINE path vs a float64 numpy oracle ----------
    # (matched-accuracy requirement of the north star, at the user surface:
    # smoothed means, smoothed covariances, and the Bethe FE — which equals
    # −log Z exactly on this tree model)
    TA, BA = 256, 8
    ya = rng.standard_normal((BA, TA, d)).astype(np.float32)
    posts_a, fe_a = rx.infer_batched(
        gen_lgssm, {"y": ya}, iterations=1, free_energy=True)
    fm_a = np.asarray(posts_a["x"].mean())          # (BA, TA, d)
    fv_a = np.asarray(posts_a["x"].cov())           # (BA, TA, d, d)

    def _np_rts(m0i, p0i, yi):
        """float64 RTS smoother + logZ by prediction-error decomposition."""
        f64, q64 = f_mat.astype(np.float64), np.float64(q)
        h64, r64 = h.astype(np.float64), r.astype(np.float64)
        mf, pf = [], []
        m, p = m0i.astype(np.float64), p0i.astype(np.float64)
        logz = 0.0
        for t in range(TA):
            if t > 0:
                m = f64 @ m
                p = f64 @ p @ f64.T + q64
            s_t = h64 @ p @ h64.T + r64
            innov = yi[t].astype(np.float64) - h64 @ m
            logz += -0.5 * (
                d * np.log(2 * np.pi) + np.linalg.slogdet(s_t)[1]
                + innov @ np.linalg.solve(s_t, innov)
            )
            k = p @ h64.T @ np.linalg.inv(s_t)
            m = m + k @ innov
            p = p - k @ h64 @ p
            mf.append(m.copy())
            pf.append(p.copy())
        ms = [None] * TA
        ps = [None] * TA
        ms[-1], ps[-1] = mf[-1], pf[-1]
        for t in range(TA - 2, -1, -1):
            ppred = f64 @ pf[t] @ f64.T + q64
            g = pf[t] @ f64.T @ np.linalg.inv(ppred)
            ms[t] = mf[t] + g @ (ms[t + 1] - f64 @ mf[t])
            ps[t] = pf[t] + g @ (ps[t + 1] - ppred) @ g.T
        return np.stack(ms), np.stack(ps), logz

    m0a = np.zeros((BA, d), np.float64)
    p0a = np.broadcast_to(p0.astype(np.float64), (BA, d, d))
    oracle = [_np_rts(m0a[i], p0a[i], ya[i]) for i in range(BA)]
    accuracy_err = float(max(
        np.abs(fm_a[i] - oracle[i][0]).max() for i in range(BA)))
    accuracy_cov_err = float(max(
        np.abs(fv_a[i] - oracle[i][1]).max() for i in range(BA)))
    # engine FE == −logZ on trees: relative error of the evidence estimate
    accuracy_fe_rel = float(max(
        abs(-float(fe_a[-1, i]) - oracle[i][2]) / abs(oracle[i][2])
        for i in range(BA)))

    # bf16 moment-streaming accuracy on the same float64 oracle workload
    posts_b16, fe_b16 = rx.infer_batched(
        gen_lgssm, {"y": ya}, iterations=1, free_energy=True,
        options={"fused_moment_dtype": "bfloat16"})
    fm_b16 = np.asarray(posts_b16["x"].mean())
    fv_b16 = np.asarray(posts_b16["x"].cov())
    bf16_err = float(max(
        np.abs(fm_b16[i] - oracle[i][0]).max() for i in range(BA)))
    bf16_cov_err = float(max(
        np.abs(fv_b16[i] - oracle[i][1]).max() for i in range(BA)))
    bf16_fe_rel = float(max(
        abs(-float(fe_b16[-1, i]) - oracle[i][2]) / abs(oracle[i][2])
        for i in range(BA)))

    # strict-fp32 accuracy on the same float64 oracle workload
    posts_st, fe_st = rx.infer_batched(
        gen_lgssm, {"y": ya}, iterations=1, free_energy=True,
        options={"matmul_precision": "highest"})
    fm_st = np.asarray(posts_st["x"].mean())
    fv_st = np.asarray(posts_st["x"].cov())
    strict_err = float(max(
        np.abs(fm_st[i] - oracle[i][0]).max() for i in range(BA)))
    strict_cov_err = float(max(
        np.abs(fv_st[i] - oracle[i][1]).max() for i in range(BA)))
    strict_fe_rel = float(max(
        abs(-float(fe_st[-1, i]) - oracle[i][2]) / abs(oracle[i][2])
        for i in range(BA)))

    # int8 observation-ingest accuracy on the same float64 oracle workload
    # (the oracle sees the EXACT observations; the int8 run sees ŷ — this
    # measures the end-to-end cost of quantized ingest, quantization error
    # included)
    posts_i8, fe_i8 = rx.infer_batched(
        gen_lgssm, {"y": ya}, iterations=1, free_energy=True,
        options={"observation_dtype": "int8"})
    fm_i8 = np.asarray(posts_i8["x"].mean())
    fv_i8 = np.asarray(posts_i8["x"].cov())
    i8_err = float(max(
        np.abs(fm_i8[i] - oracle[i][0]).max() for i in range(BA)))
    i8_cov_err = float(max(
        np.abs(fv_i8[i] - oracle[i][1]).max() for i in range(BA)))
    i8_fe_rel = float(max(
        abs(-float(fe_i8[-1, i]) - oracle[i][2]) / abs(oracle[i][2])
        for i in range(BA)))

    print(json.dumps({
        "metric": "LGSSM d=4 T=10k smoothing message updates/sec/chip "
                  "(1024 parallel chains, fused Pallas RTS via "
                  "rx.batched_program — the user-facing engine path)",
        "value": round(engine_b1024_updates_per_sec, 1),
        "unit": "updates/s",
        "vs_baseline": round(
            engine_b1024_updates_per_sec / baseline_updates_per_sec, 2
        ),
        "ops_level_b1024_updates_per_sec": round(
            fused_b1024_updates_per_sec, 1
        ),
        "engine_vs_ops_ratio": round(
            engine_b1024_updates_per_sec / fused_b1024_updates_per_sec, 3
        ),
        "accuracy_max_abs_err_vs_float64_oracle": accuracy_err,
        "accuracy_cov_max_abs_err_vs_float64_oracle": accuracy_cov_err,
        "accuracy_fe_rel_err_vs_float64_logZ": accuracy_fe_rel,
        "hbm_modeled_bytes_per_call_lower_bound": int(bytes_fp32),
        "hbm_bytes_per_sec": round(hbm_bytes_per_sec, 1),
        "hbm_utilization_vs_819GBs_peak": round(hbm_utilization, 4),
        "engine_b1024_bf16_moments_updates_per_sec": round(
            engine_bf16_updates_per_sec, 1),
        "bf16_vs_fp32_speedup": round(t_eng / t_eng_bf16, 3),
        "bf16_accuracy_max_abs_err_vs_float64_oracle": bf16_err,
        "bf16_accuracy_cov_max_abs_err_vs_float64_oracle": bf16_cov_err,
        "bf16_accuracy_fe_rel_err_vs_float64_logZ": bf16_fe_rel,
        "strict_fp32_engine_b1024_updates_per_sec": round(
            3 * T * B2 / t_eng_strict, 1),
        "strict_fp32_vs_default_time_ratio": round(
            t_eng_strict / t_eng, 3),
        "strict_fp32_accuracy_max_abs_err_vs_float64_oracle": strict_err,
        "strict_fp32_accuracy_cov_max_abs_err_vs_float64_oracle":
            strict_cov_err,
        "strict_fp32_accuracy_fe_rel_err_vs_float64_logZ": strict_fe_rel,
        "dyn_precision_engine_b1024_updates_per_sec": round(
            dyn_engine_updates_per_sec, 1),
        "dyn_precision_vs_baseline": round(
            dyn_engine_updates_per_sec / baseline_updates_per_sec, 1),
        "dyn_precision_vs_static_engine_ratio": round(
            dyn_engine_updates_per_sec / engine_b1024_updates_per_sec, 3),
        "dyn_fused_vs_scan_speedup_b256_t2048": round(
            t_scan_s / t_dyn_s, 2),
        "dyn_fused_vs_scan_max_abs_mean_diff": dyn_vs_scan_err,
        "int8_engine_b1024_updates_per_sec": round(
            engine_i8_updates_per_sec, 1),
        "int8_vs_fp32_speedup_iter1": round(t_eng / t_eng_i8, 3),
        "int8_vs_fp32_speedup_iter10": round(t_it / t_it_i8, 3),
        "int8_accuracy_max_abs_err_vs_float64_oracle": i8_err,
        "int8_accuracy_cov_max_abs_err_vs_float64_oracle": i8_cov_err,
        "int8_accuracy_fe_rel_err_vs_float64_logZ": i8_fe_rel,
        "int8_dequant_matmul_bytes_per_sec": round(
            int8_dequant_bytes_per_sec, 1),
        "int8_dequant_matmul_speed_of_light_frac": round(
            int8_dequant_bytes_per_sec / HBM_PEAK, 4),
        "int8_dequant_matmul_vs_fp32_traffic_ratio": round(
            fp32_equiv_bytes / dq_bytes, 3),
        "int8_dequant_pallas_vs_xla_time_ratio": round(
            t_dq_xla / t_dq_pl, 3),
        "int8_evidence_ingest_speedup_vs_fp32": round(
            t_ing_f32 / t_ing_i8, 3),
        "int8_evidence_ingest_bytes_per_sec": round(
            B2 * T * (d * 1 + 4.0 / T + d * 4) / t_ing_i8, 1),
        "d16_fused_engine_b1024_updates_per_sec": round(
            d16_fused_engine_updates_per_sec, 1),
        "d16_fused_vs_baseline": round(
            d16_fused_engine_updates_per_sec / baseline_updates_per_sec, 1),
        "d16_engine_b16_updates_per_sec": round(
            d16_engine_updates_per_sec, 1),
        "d16_ops_b16_updates_per_sec": round(d16_ops_updates_per_sec, 1),
        "d16_engine_vs_ops_ratio": round(t_ops16 / t_eng16, 3),
        "d16_accuracy_max_abs_err_vs_float64_oracle": d16_err,
        "time_sharded_T100k_updates_per_sec": round(
            time_sharded_updates_per_sec, 1),
        "time_sharded_vs_local_smoother_ratio": round(
            time_sharded_vs_local, 3),
        "single_chain_updates_per_sec": round(updates_per_sec, 1),
        "single_chain_vs_baseline": round(
            updates_per_sec / baseline_updates_per_sec, 2
        ),
        "single_chain_ms": round(t_single * 1e3, 3),
        "batched64_updates_per_sec": round(batched_updates_per_sec, 1),
        "batched64_vs_baseline": round(
            batched_updates_per_sec / baseline_updates_per_sec, 2
        ),
        "batched64_fused_pallas_updates_per_sec": round(
            fused_b64_updates_per_sec, 1
        ),
        "streaming_filter_10k_chains_state_updates_per_sec": round(
            filter_updates_per_sec, 1
        ),
        "streaming_filter_fused_pallas_state_updates_per_sec": round(
            fused_filter_updates_per_sec, 1
        ),
        "streaming_engine_mesh_10k_chains_state_updates_per_sec": round(
            streaming_engine_updates_per_sec, 1
        ),
        "streaming_engine_generic_tick_updates_per_sec": round(
            streaming_engine_generic_updates_per_sec, 1
        ),
        "gmm_1k_datasets_vmp_updates_per_sec": round(gmm_updates_per_sec, 1),
        "hmm_256x200_engine_fused_vmp_updates_per_sec": round(
            hmm_updates_per_sec, 1
        ),
        "hmm_fused_pallas_vmp_updates_per_sec": round(
            hmm_fused_updates_per_sec, 1
        ),
        "hmm_fused_pallas_per_step_xi_updates_per_sec": round(
            hmm_fused_ps_updates_per_sec, 1
        ),
        "hmm_engine_vs_like_for_like_kernel_ratio": round(
            t_hmm_ps / t_hmm, 3
        ),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
