"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: batched-OMP atom-selection throughput on the BASELINE config-2
style workload (shared 1024 x 8192 Gaussian dictionary, 64 problem
instances, k=32). The reference publishes no numbers (BASELINE.md), so
`vs_baseline` is measured throughput relative to the HBM-roofline ideal:
an OMP step that streams the f32 dictionary from HBM once costs n*m*4
bytes (amortized across the whole batch by the batched-GEMM formulation),
so ideal atoms/sec = B * BW / (n*m*4), with BW the *measured* streaming
bandwidth of this device (self-calibrating — nominal specs are meaningless
behind a tunnel). The fused whole-solve kernel (cstpu.ops.fused_solve)
BEATS this roofline (vs_baseline > 1) by pinning the dictionary in VMEM
across all k steps and consuming it at MXU rate in bf16; the planted
supports must still be exactly recovered (asserted, `recovery` on stderr).

Measurement methodology (tunneled-device safe):
  * chain R dependent executions inside one jit (fori_loop, i-dependent
    inputs to defeat CSE/caching) and time at two rep counts — the
    difference cancels the fixed dispatch/sync overhead, which on a
    tunneled device can be ~0.5 s per round trip;
  * synchronize by fetching the scalar result value (float(...)):
    block_until_ready under-synchronizes on some remote platforms;
  * every timed call gets a uniquely perturbed input so no layer can
    serve a cached result.

Extra diagnostics (correlation GB/s, streaming BW, wall times) on stderr.
"""

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    # persistent compile cache: repeat bench runs (and reruns after a
    # tunnel hiccup) skip the remote compile entirely when the backend
    # supports executable serialization
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    dev = jax.devices()[0]
    on_cpu = "cpu" in dev.device_kind.lower()
    # B=64 is the MEASURED optimum for atoms/s on v5e: the r4 B-sweep
    # read 6.65M atoms/s median at B=64 vs 4.55M at B=128 (the kernel's
    # VPU-side state sweeps scale superlinearly with B past the VMEM
    # sweet spot) — the "fill 128 MXU rows with B=256" hypothesis is
    # refuted on hardware.
    B, n, m, k = (64, 1024, 8192, 32) if not on_cpu else (8, 256, 1024, 8)

    key = jax.random.PRNGKey(0)
    ka, kx = jax.random.split(key)
    A = jax.random.normal(ka, (n, m), jnp.float32)
    A = A / jnp.sqrt(jnp.sum(A * A, axis=0, keepdims=True))
    sup = jax.vmap(lambda kk: jax.random.permutation(kk, m)[:k])(
        jax.random.split(kx, B))
    X = jnp.zeros((B, m), jnp.float32)
    X = jax.vmap(lambda x, s: x.at[s].set(1.0))(X, sup)
    Bs = X @ A.T  # (B, n)

    uniq = [0]

    def timed(chain_fn, arg, reps):
        """Wall time of one value-fetched call with a unique input.

        The perturbation is RELATIVE (1 + eps): an additive 1e-30 is
        below the f32 ulp of O(1) data and rounds back to identical
        bits, which would let a value-hashing layer serve cached
        results; 1e-7 relative actually changes the bits without
        affecting selection decisions."""
        uniq[0] += 1
        a = arg * jnp.asarray(1.0 + uniq[0] * 1e-7, arg.dtype)
        t0 = time.perf_counter()
        float(chain_fn(a, reps))
        return time.perf_counter() - t0

    def per_rep_epochs(chain_fn, arg, r1, r2, epochs=3):
        """Two-point measurement repeated over timing epochs.

        Tunneled-device throughput wobbles +-40% between sessions and the
        FIRST steady-state reads ~3x slow on cold device caches
        (benchmarks/README.md); one two-point sample therefore reports
        tunnel weather, not capability. Protocol: compile, flush the cold
        caches with untimed executions, then run the overhead-cancelled
        two-point measurement `epochs` times (each point min-of-3) and
        return every epoch's seconds-per-rep — callers headline the BEST
        epoch (capability) and log the median (weather)."""
        chain_fn(arg, r1)  # compile both trip counts
        chain_fn(arg, r2)
        for _ in range(2):  # cold-cache flush, untimed
            timed(chain_fn, arg, r2)
        out = []
        for _ in range(epochs):
            t1 = min(timed(chain_fn, arg, r1) for _ in range(3))
            t2 = min(timed(chain_fn, arg, r2) for _ in range(3))
            out.append(max((t2 - t1) / (r2 - r1), 1e-12))
        return out

    def per_rep(chain_fn, arg, r1, r2, epochs=3):
        return min(per_rep_epochs(chain_fn, arg, r1, r2, epochs))

    # --- flagship: batched OMP solve ---------------------------------------
    # routes through omp_batch: on TPU this is the whole-solve fused Pallas
    # kernel (cstpu.ops.fused_solve) with the dictionary pinned in VMEM
    from cstpu.models.batched import omp_batch

    def solve_one(Bs_):
        # consume the PUBLIC API result (SparseSolution) directly — the
        # dense scatter view is a presentation choice, not part of the
        # solve, and inside the timed chain it cost ~0.15 ms/solve
        # (bench read 0.46 ms while the kernel+solution path is 0.31)
        sol = omp_batch(A, Bs_, k)
        return (jnp.sum(sol.val) + jnp.sum(sol.idx.astype(jnp.float32))
                + jnp.sum(sol.mask))

    from functools import partial

    @partial(jax.jit, static_argnames=("reps",))
    def solve_chain(Bs, reps: int):
        def body(i, acc):
            # relative perturbation: must actually change bits (see timed)
            return acc + solve_one(Bs * (1.0 + i.astype(jnp.float32)
                                         * 1e-7))
        return lax.fori_loop(0, reps, body, jnp.float32(0))

    solve_epochs = per_rep_epochs(solve_chain, Bs, 2, 22, epochs=5)
    t_solve = min(solve_epochs)
    t_solve_median = sorted(solve_epochs)[len(solve_epochs) // 2]
    atoms_per_sec = B * k / t_solve

    # integrity: the timed path must actually recover the planted supports
    import numpy as np
    sol = omp_batch(A, Bs, k)
    got = np.sort(np.where(np.asarray(sol.mask), np.asarray(sol.idx), m), 1)
    planted = np.sort(np.asarray(sup), axis=1)
    recovery = float(np.mean([set(planted[i]) <= set(got[i])
                              for i in range(B)]))
    # the docstring's contract: a fast WRONG solver must not ship a
    # headline number — fail the bench outright
    assert recovery == 1.0, f"planted-support recovery {recovery} != 1.0"

    # --- calibration: streaming bandwidth over an A-sized buffer -----------
    @partial(jax.jit, static_argnames=("reps",))
    def bw_chain(A, reps: int):
        def body(i, acc):
            return acc + jnp.sum(jnp.abs(A + i.astype(jnp.float32)))
        return lax.fori_loop(0, reps, body, jnp.float32(0))

    t_bw = per_rep(bw_chain, A, 8, 5008)
    measured_bw = n * m * 4 / t_bw

    # --- diagnostic: raw correlation GEMM ----------------------------------
    @partial(jax.jit, static_argnames=("reps",))
    def corr_chain(Bs, reps: int):
        # roll (not add): an additive perturbation lets XLA distribute the
        # matmul and hoist it out of the loop entirely
        def body(i, acc):
            s = jnp.abs(jnp.roll(Bs, i, axis=1) @ A)
            return acc + jnp.sum(s)
        return lax.fori_loop(0, reps, body, jnp.float32(0))

    t_corr = per_rep(corr_chain, Bs, 8, 208)
    corr_bytes = (n * m + B * n + B * m) * 4
    if t_corr < 1e-6:
        # the two-point delta collapsed (compiler hoisted the loop or
        # timer noise won) — an absurd effective-GB/s diagnostic is
        # worse than none
        t_corr = float("nan")

    ideal_atoms = B * measured_bw / (n * m * 4)
    vs = atoms_per_sec / ideal_atoms

    # MXU utilization: the solve's model flops are the k selection GEMMs
    # (2*B*n*m each — the column-extraction GEMM was replaced by aligned
    # slices, and state updates are VPU work, so this is the MXU-side
    # floor). v5e public peak: 197 TFLOP/s bf16. Reported on the MEDIAN
    # epoch — with the dictionary VMEM-pinned, this fraction (not the
    # HBM stream roofline) is the honest headroom gauge.
    PEAK_BF16 = 197e12
    model_flops = 2.0 * B * n * m * k
    mxu_tflops = model_flops / t_solve_median / 1e12
    mxu_frac = mxu_tflops * 1e12 / PEAK_BF16

    # corr_effective_GBps is NOT a memory bandwidth: XLA hoists the
    # loop-invariant dictionary into VMEM, so the "traffic" numerator is
    # algorithmic bytes, not HBM bytes — it can (and does) exceed the
    # measured HBM stream rate. Kept as an MXU-side utilization indicator.
    print(f"[bench] device={dev.device_kind} B={B} n={n} m={m} k={k} "
          f"solve={t_solve*1e3:.2f}ms solve_median={t_solve_median*1e3:.2f}ms "
          f"epochs_ms={[round(t*1e3, 2) for t in solve_epochs]} "
          f"corr={t_corr*1e3:.3f}ms "
          f"corr_effective_GBps={corr_bytes/t_corr/1e9:.1f} "
          f"stream_GBps={measured_bw/1e9:.1f} roofline_frac={vs:.3f} "
          f"mxu_TFLOPs={mxu_tflops:.1f} mxu_frac={mxu_frac:.3f} "
          f"recovery={recovery:.3f}",
          file=sys.stderr)

    # value = MEDIAN epoch (honest round-over-round comparable);
    # value_best = best epoch (capability diagnostic) — the tunnel wobbles
    # +-40% between sessions, so the headline must not ride the weather
    atoms_per_sec_median = B * k / t_solve_median
    print(json.dumps({
        "metric": "omp_batched_atom_selections_per_sec",
        "value": round(atoms_per_sec_median, 1),
        "value_best": round(atoms_per_sec, 1),
        "unit": "atoms/s",
        "vs_baseline": round(atoms_per_sec_median / ideal_atoms, 4),
        "vs_baseline_best": round(vs, 4),
        "mxu_frac_of_bf16_peak": round(mxu_frac, 4),
        "batch": B,
    }))


if __name__ == "__main__":
    main()
