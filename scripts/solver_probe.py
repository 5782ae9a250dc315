"""Per-shape solver measurement harness (round-5, verdict item 4).

Probes (T, B) x {AoS vmapped scan, SoA leading-batch scan, fused Pallas,
time_blocked@1dev} LGSSM smoothing on the REAL chip with bench.py's
on-device two-point-slope timing, repeats the whole measurement R times, and
emits one JSON line per (shape, solver) with the median updates/s and the
run-to-run spread.  This is the repeatable measurement the round-4
time-blocked default-solver investigation lacked (commit 1d1a77c's probes
were one-shot and wildly non-monotone).

Run from /root/repo:  python scripts/solver_probe.py [--quick]
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")  # bench.py helpers (repo root)


def main():
    import jax
    import jax.numpy as jnp
    import os

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import _median_time, _scalarize
    from jax.sharding import Mesh

    from rxinfer_tpu.ops.kalman import ChainParams, parallel_smoother
    from rxinfer_tpu.ops.pallas_smoother import fused_batched_smoother
    from rxinfer_tpu.parallel.time_blocked import time_blocked_smooth

    quick = "--quick" in sys.argv
    d = 4
    theta = np.pi / 35
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
        dtype=np.float32,
    )
    f_mat = np.kron(np.eye(d // 2, dtype=np.float32), rot)
    q = np.eye(d, dtype=np.float32)
    w_obs = 1.69 * np.eye(d, dtype=np.float32)
    m0 = np.zeros(d, np.float32)
    p0 = 25.0 * np.eye(d, dtype=np.float32)

    shapes = [(10_000, 1), (30_000, 1), (100_000, 1),
              (10_000, 16), (30_000, 16)]
    if quick:
        shapes = [(10_000, 1), (30_000, 1)]
    repeats = 2 if quick else 3

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("time",))
    rng = np.random.default_rng(0)
    results = []

    def aos_params(T, xi):
        return ChainParams(
            jnp.asarray(m0), jnp.asarray(p0),
            jnp.broadcast_to(jnp.asarray(f_mat), (T - 1, d, d)),
            jnp.zeros((T - 1, d)),
            jnp.broadcast_to(jnp.asarray(q), (T - 1, d, d)),
            xi,
            jnp.broadcast_to(jnp.asarray(w_obs), (T, d, d)),
        )

    for T, B in shapes:
        xi = jnp.asarray(
            rng.standard_normal((B, T, d)).astype(np.float32))
        jax.block_until_ready(xi)
        solvers = {}

        # AoS: per-chain parallel_smoother, vmapped over the leading batch
        def aos(xi_in):
            def one(x1):
                r = parallel_smoother(aos_params(T, x1))
                return r.means, r.covs
            return jax.vmap(one)(xi_in)
        solvers["aos_vmap_scan"] = _scalarize(aos)

        # SoA: leading-batch ChainParams (native batched scan path)
        def soa(xi_in):
            p = ChainParams(
                jnp.broadcast_to(jnp.asarray(m0), (B, d)),
                jnp.broadcast_to(jnp.asarray(p0), (B, d, d)),
                jnp.broadcast_to(jnp.asarray(f_mat), (B, T - 1, d, d)),
                jnp.zeros((B, T - 1, d)),
                jnp.broadcast_to(jnp.asarray(q), (B, T - 1, d, d)),
                xi_in,
                jnp.broadcast_to(jnp.asarray(w_obs), (B, T, d, d)),
            )
            r = parallel_smoother(p)
            return r.means, r.covs
        solvers["soa_batched_scan"] = _scalarize(soa)

        # fused Pallas kernel (time-major payload)
        def fused(xi_in):
            xi_t = jnp.moveaxis(xi_in, 0, 1)       # (T, B, d)
            return fused_batched_smoother(
                jnp.broadcast_to(jnp.asarray(m0), (B, d)),
                jnp.broadcast_to(jnp.asarray(p0), (B, d, d)),
                xi_t, f_mat, np.zeros(d, np.float32), q, w_obs, chunk=8,
            )[:2]
        solvers["fused_pallas"] = _scalarize(fused)

        # time-blocked distributed scan on a 1-device mesh (B=1 only)
        if B == 1:
            def tb(xi_in):
                return time_blocked_smooth(
                    mesh1, "time", jnp.asarray(m0), jnp.asarray(p0),
                    jnp.broadcast_to(jnp.asarray(f_mat), (T - 1, d, d)),
                    jnp.zeros((T - 1, d)),
                    jnp.broadcast_to(jnp.asarray(q), (T - 1, d, d)),
                    xi_in[0],
                    jnp.broadcast_to(jnp.asarray(w_obs), (T, d, d)),
                )[:2]
            solvers["time_blocked_1dev"] = _scalarize(tb)

        for name, fn in solvers.items():
            times = []
            for _ in range(repeats):
                times.append(_median_time(fn, (xi,)))
            med = float(np.median(times))
            spread = (float(np.max(times) - np.min(times)) / med
                      if med > 0 else float("inf"))
            row = {
                "solver": name, "T": T, "B": B, "d": d,
                "updates_per_sec": round(3 * T * B / med, 1),
                "median_s": round(med, 6),
                "spread_frac": round(spread, 4),
                "repeats": repeats,
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    # markdown table for docs/performance.md
    print("\n| solver | T | B | upd/s | spread |")
    print("|---|---|---|---|---|")
    for r in results:
        print(f"| {r['solver']} | {r['T']} | {r['B']} | "
              f"{r['updates_per_sec']:.3g} | {r['spread_frac']:.1%} |")


if __name__ == "__main__":
    main()
