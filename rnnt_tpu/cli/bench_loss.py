"""RNN-T loss kernel timing harness.

Equivalent of warp-transducer's `test_time` / `test_time_gpu` binaries
(cmake/warp-rnnt-cmakelist.txt:104-106,128-130): times every loss
implementation at a given lattice geometry and reports achieved TFLOP/s
(the fused path's FLOPs are dominated by the joint vocab projection,
2*B*T*(U+1)*J*V fwd).

  python -m rnnt_tpu.cli.bench_loss --B 64 --T 128 --U 64 --V 4096
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--B", type=int, default=64)
    p.add_argument("--T", type=int, default=128,
                   help="encoder frames (post time-reduction)")
    p.add_argument("--U", type=int, default=64)
    p.add_argument("--V", type=int, default=4096)
    p.add_argument("--J", type=int, default=640)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--impls", nargs="+",
                   default=["ref", "pallas", "fused"])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import rnnt_tpu.ops.rnnt_loss_ref as ref_mod
    from rnnt_tpu.ops.rnnt_loss_pallas import rnnt_loss_pallas
    from rnnt_tpu.ops.joint_loss_fused import rnnt_loss_fused

    B, T, U, V, J = args.B, args.T, args.U, args.V, args.J
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    # the materialized [B,T,U+1,V] lattice is ~8.7 GB fp32 at defaults —
    # only build (and ship over the device link) when a lattice impl runs
    logits = None
    if any(i in args.impls for i in ("ref", "pallas")):
        logits = jnp.asarray(rng.standard_normal((B, T, U + 1, V)),
                             jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    fl = jnp.full((B,), T, jnp.int32)
    yl = jnp.full((B,), U, jnp.int32)
    f = jnp.asarray(rng.standard_normal((B, T, J)), dtype)
    g = jnp.asarray(rng.standard_normal((B, U + 1, J)), dtype)
    b1 = jnp.zeros((J,), dtype)
    b2 = jnp.zeros((V,), dtype)
    w2 = jnp.asarray(rng.standard_normal((J, V)) * 0.1, dtype)

    # data rides as jit ARGUMENTS: a closed-over lattice would be inlined
    # into the HLO as a constant — the tunnel compile service rejects the
    # multi-hundred-MB request bodies that produces (HTTP 413)
    fns = {
        "ref": (lambda x: jnp.sum(ref_mod.rnnt_loss_ref(x, labels, fl, yl)),
                logits),
        "pallas": (lambda x: jnp.sum(rnnt_loss_pallas(x, labels, fl, yl)),
                   logits),
        "fused": (lambda x: jnp.sum(rnnt_loss_fused(
                      x, g, b1, w2, b2, labels, fl, yl)),
                  f),
    }

    def timeit(fn, n):
        # materialize the warmup: on the tunnel-attached chip dispatch
        # returns before remote compile finishes, so an un-awaited warmup
        # leaks the compile into the timed loop
        float(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        float(r)
        return (time.perf_counter() - t0) / n

    joint_flops = 2 * B * T * (U + 1) * J * V  # fwd, fused path only
    print(f"backend={jax.default_backend()} B={B} T={T} U={U} V={V} J={J}")
    for impl in args.impls:
        lossfn, darg = fns[impl]
        jfwd = jax.jit(lossfn)
        jgrad = jax.jit(lambda x: jax.grad(lossfn)(x))
        try:
            t_f = timeit(lambda: jfwd(darg), args.iters)
            g0 = jgrad(darg)
            jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), g0)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                g0 = jgrad(darg)
            float(jnp.sum(jax.tree_util.tree_leaves(g0)[0].astype(jnp.float32)))
            t_g = (time.perf_counter() - t0) / args.iters
            extra = ""
            if impl == "fused":
                extra = f"  fwd {joint_flops / t_f / 1e12:.1f} TFLOP/s"
            print(f"{impl:8s} fwd {t_f * 1e3:8.2f} ms   fwd+bwd "
                  f"{t_g * 1e3:8.2f} ms{extra}")
        except Exception as e:
            print(f"{impl:8s} failed: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
