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


def _median_time(fn, n=5, inner=20):
    """Median over n trials of `inner` pipelined calls (single sync at the end):
    amortizes per-call host dispatch, which dominates sub-ms device programs."""
    import jax

    jax.block_until_ready(fn())  # warm
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = fn()
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / inner)
    return float(np.median(times))


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

    smooth = jax.jit(lambda p: parallel_smoother(p)[:2])
    jax.block_until_ready(smooth(params))  # compile
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
    bsmooth = jax.jit(jax.vmap(lambda p: parallel_smoother(p)[:2]))
    jax.block_until_ready(bsmooth(pb))
    t_batch = _median_time(lambda: bsmooth(pb), n=3, inner=5)
    batched_updates_per_sec = 3 * T * B / t_batch

    # streaming filtering over 10k parallel chains (BASELINE config 5)
    BF, TF = 10_000, 200
    ys = jnp.asarray(rng.standard_normal((TF, BF, d)).astype(np.float32))
    jax.block_until_ready(ys)  # pre-stage on device: time compute, not PCIe
    state = FilterState(
        jnp.zeros((BF, d)), jnp.broadcast_to(jnp.asarray(p0), (BF, d, d))
    )
    filt = jax.jit(
        lambda st, ys: filtering_scan(st, ys, jnp.asarray(f_mat), jnp.asarray(q),
                                      jnp.asarray(h), jnp.asarray(r))
    )
    jax.block_until_ready(filt(state, ys))
    t_filt = _median_time(lambda: filt(state, ys), n=3, inner=3)
    filter_updates_per_sec = BF * TF / t_filt

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
        "streaming_filter_10k_chains_state_updates_per_sec": round(
            filter_updates_per_sec, 1
        ),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
