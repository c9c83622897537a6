"""Multi-process distributed worker: one rank of a 2-process CPU job.

Exercises the DCN code path (jax.distributed + cross-process mesh) that
the single-process virtual mesh cannot: tests/test_dist.py spawns two of
these against a loopback coordinator (SURVEY.md §4 multi-node testing).

Usage: python scripts/dist_worker.py PORT PROC_ID NUM_PROCS DEVS_PER_PROC
"""
import sys

sys.path.insert(0, ".")


def main() -> int:
    port, pid, nproc, ndev = (int(x) for x in sys.argv[1:5])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", ndev)

    from mh_spgemm_tpu.parallel.mesh import init_multihost, make_row_mesh

    init_multihost(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * ndev

    from mh_spgemm_tpu import oracle_spgemm
    from mh_spgemm_tpu.bench import gen
    from mh_spgemm_tpu.parallel.spgemm_dist import spgemm_dist

    mesh = make_row_mesh()              # spans both processes
    A = gen.banded(64, band=5, nnz_per_row=4, seed=42)
    ref = oracle_spgemm(A, A)
    for strategy in ("allgather", "ragged"):
        for engine in ("bucketed", "esc"):
            C = spgemm_dist(A, None, mesh, b_strategy=strategy,
                            engine=engine)
            assert C.equals(ref, tol=1e-9), (strategy, engine)
    print(f"proc {pid}: multiprocess dist OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
