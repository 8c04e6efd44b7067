"""Multi-host party smoke: N CPU processes form one jax.distributed universe
and run the sharded match step (what a real multi-host party does over ICI/DCN).

Run (single machine, CPU backend, 2 processes):

    JAX_PLATFORMS=cpu python scripts/multihost_smoke.py --procs 2

The launcher forks the workers; each initializes via parallel.multihost,
loads its local DB rows, builds the global mesh, and executes one sharded
plaintext match; process 0 prints the winners. Exit code 0 = all ranks agreed.
"""

import argparse
import os
import subprocess
import sys


def worker(rank: int, procs: int, port: int) -> int:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mpc_iris_tpu.parallel import ShardedPlaintextEngine, make_mesh, multihost

    multihost.init_party(
        coordinator_address=f"127.0.0.1:{port}", num_processes=procs, process_id=rank
    )
    info = multihost.party_info()
    assert info["process_count"] == procs, info

    rng = np.random.default_rng(7)  # same data on every rank (tiny smoke DB)
    n = 64
    dpat = rng.integers(0, 256, (n, 1600), dtype=np.uint8)
    dmsk = rng.integers(0, 256, (n, 1600), dtype=np.uint8)
    qpat, qmsk = dpat[5:7].copy(), dmsk[5:7].copy()  # self-match queries

    mesh = make_mesh(db=len(jax.devices()), batch=1)
    eng = ShardedPlaintextEngine(dpat, dmsk, mesh, chunk=8)
    results = eng.match(qpat, qmsk)
    ok = [r.index for r in results] == [5, 6] and all(
        r.distance == 0.0 for r in results
    )
    if rank == 0:
        print(f"rank0: winners {[r.index for r in results]}, "
              f"distances {[r.distance for r in results]}, "
              f"devices={info['global_devices']} procs={procs} -> "
              f"{'OK' if ok else 'MISMATCH'}")
    return 0 if ok else 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--procs", type=int, default=2)
    p.add_argument("--port", type=int, default=29401)
    p.add_argument("--rank", type=int, default=None, help="(internal)")
    args = p.parse_args()

    if args.rank is not None:
        sys.exit(worker(args.rank, args.procs, args.port))

    procs = []
    for r in range(args.procs):
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--procs", str(args.procs),
             "--port", str(args.port), "--rank", str(r)],
        ))
    rc = max(p.wait() for p in procs)
    print("multihost smoke:", "OK" if rc == 0 else "FAILED")
    sys.exit(rc)


if __name__ == "__main__":
    main()
