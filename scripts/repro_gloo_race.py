"""Minimal characterization of the Gloo CPU intra-program collective race.

Two jax.distributed CPU processes (1 device each, mesh ('model',)=2) run a
jitted shard_map program containing K INDEPENDENT psums (no data deps
between them), repeatedly.  If the XLA CPU thunk executor's concurrent
scheduling of independent collective thunks can mismatch/starve the Gloo
rendezvous, this hangs or returns wrong sums at some K; with K=1 (fully
chained) it must always pass.

  python scripts/repro_gloo_race.py [K] [iters] [--chain] [--xla=FLAGS]

--chain: serialize the K psums with jax.lax.optimization_barrier (control).
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _worker(k, iters, chain, port, pid):
    import jax

    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("model",))

    def body(xs):
        # xs: [K, N] per shard; K independent psums (no deps between rows)
        outs = []
        prev = None
        for i in range(k):
            x = xs[i]
            if chain and prev is not None:
                x, _ = jax.lax.optimization_barrier((x, prev))
            o = jax.lax.psum(x * (i + 1), "model")
            outs.append(o)
            prev = o
        return jnp.stack(outs)

    f = jax.jit(jax.shard_map(body, mesh=mesh,
                              in_specs=P("model", None),
                              out_specs=P("model", None)))
    # per-shard rows: global first axis 2*K/2 = K rows per process... keep
    # it simple: global [2k, N] sharded over axis 0 -> each shard sees [k, N]
    rng = np.random.default_rng(0)
    glob = rng.standard_normal((2 * k, 256)).astype(np.float32)
    sh = NamedSharding(mesh, P("model", None))
    xs = jax.make_array_from_process_local_data(
        sh, glob[pid * k: (pid + 1) * k])

    # expected: psum over the two shards of row i equals
    # (glob[i] + glob[k + i]) * (i + 1), identical on both shards
    expect = np.stack([(glob[i] + glob[k + i]) * (i + 1) for i in range(k)])
    for it in range(iters):
        out = jax.block_until_ready(f(xs))
        # only this process's shard is addressable
        local = np.asarray(out.addressable_shards[0].data)
        np.testing.assert_allclose(local, expect, rtol=1e-4, atol=1e-5,
                                   err_msg=f"iter {it} WRONG COLLECTIVE DATA")
        if it % 10 == 0 and pid == 0:
            print(f"iter {it} ok", flush=True)
    if pid == 0:
        print(f"PASS k={k} iters={iters} chain={chain}", flush=True)


def main():
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        k, iters, chain, port, pid = (int(sys.argv[i + 1]),
                                      int(sys.argv[i + 2]),
                                      sys.argv[i + 3] == "1",
                                      int(sys.argv[i + 4]),
                                      int(sys.argv[i + 5]))
        _worker(k, iters, chain, port, pid)
        return 0

    from tests.mh_harness import run_workers

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    chain = "--chain" in sys.argv
    xla_extra = ""
    for a in sys.argv:
        if a.startswith("--xla="):
            xla_extra = a[len("--xla="):]

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=1"
                        + (" " + xla_extra if xla_extra else ""))

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    cmds = [[sys.executable, os.path.abspath(__file__), "--worker",
             str(k), str(iters), "1" if chain else "0", str(port), str(pid)]
            for pid in (0, 1)]
    results = run_workers(cmds, env=env, cwd=REPO, timeout=300,
                          stall_timeout=90)
    ok = all(rc == 0 for rc, _ in results)
    print(f"{'PASS' if ok else 'FAIL'} k={k} chain={chain}")
    if not ok:
        for i, (rc, text) in enumerate(results):
            print(f"[rank {i}] rc={rc}")
            print("\n".join(text.splitlines()[-25:]))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
