"""Randomized soak: differential-test every engine over random CSR shapes.

The reference's robustness story is its 408-matrix batch (process.sh);
without SuiteSparse on disk, this generates a stream of random shapes /
densities / structures and cross-checks all engines against the scipy
oracle.  Run: python scripts/soak.py [n_cases] [seed]
"""
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main(n_cases: int = 50, seed: int = 0) -> int:
    import mh_spgemm_tpu  # noqa: F401
    from mh_spgemm_tpu import CSR, SpGEMMConfig, oracle_spgemm, spgemm_host
    from mh_spgemm_tpu.bench import gen

    rng = np.random.default_rng(seed)
    fails = 0
    for case in range(n_cases):
        kind = rng.integers(0, 5)
        if kind == 0:
            m, k, n = rng.integers(2, 400, 3)
            nnz_a = int(rng.integers(1, max(2, m * k // 3)))
            nnz_b = int(rng.integers(1, max(2, k * n // 3)))
            A = CSR.from_coo(m, k, rng.integers(0, m, nnz_a),
                             rng.integers(0, k, nnz_a),
                             rng.standard_normal(nnz_a),
                             sum_duplicates=bool(rng.integers(0, 2)))
            B = CSR.from_coo(k, n, rng.integers(0, k, nnz_b),
                             rng.integers(0, n, nnz_b),
                             rng.standard_normal(nnz_b),
                             sum_duplicates=True)
        else:
            fam = ["banded", "random", "powerlaw", "kron"][kind - 1]
            if fam == "banded":
                A = gen.banded(int(rng.integers(10, 800)),
                               band=int(rng.integers(1, 40)),
                               nnz_per_row=int(rng.integers(1, 30)),
                               seed=int(rng.integers(1 << 30)))
            elif fam == "random":
                A = gen.random_uniform(int(rng.integers(10, 800)),
                                       nnz_per_row=int(rng.integers(1, 20)),
                                       seed=int(rng.integers(1 << 30)))
            elif fam == "powerlaw":
                A = gen.powerlaw(int(rng.integers(10, 800)),
                                 avg_nnz=int(rng.integers(1, 12)),
                                 seed=int(rng.integers(1 << 30)))
            else:
                A = gen.kron(scale=int(rng.integers(4, 10)),
                             edge_factor=int(rng.integers(2, 10)),
                             seed=int(rng.integers(1 << 30)))
            B = None
        ref = oracle_spgemm(A, B if B is not None else A)
        for mode in ("bucketed", "blockdense", "masked", "esc", "auto"):
            try:
                C = spgemm_host(A, B, config=SpGEMMConfig(mode=mode))
                ok = C.equals(ref, tol=1e-9)
            except Exception as e:
                ok = False
                print(f"case {case} mode {mode}: EXC {type(e).__name__}: "
                      f"{e}")
            if not ok:
                fails += 1
                print(f"case {case} mode {mode}: MISMATCH "
                      f"(M={A.M} N={A.N} nnz={A.nnz})")
        if case % 10 == 0:
            print(f"... {case + 1}/{n_cases} done, {fails} failures")
    print(f"soak: {n_cases} cases x 5 modes, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sys.exit(main(n, s))
