"""Ground-truth XLA gather cost on this chip: k independent takes of N
indices from an M-word table, order-sensitively consumed, pipelined
timing (dispatch is async; block_until_ready only acks the enqueue; any
uncached fetch costs one ~32 ms round trip).

Usage: python scripts/micro_gather3.py [N] [M]
"""
import sys
sys.path.insert(0, ".")
import time

import jax
import jax.numpy as jnp
import numpy as np

_RTT = None


def _fetch1(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def _rtt():
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: x + 1)
        o = f(jnp.zeros((8,), jnp.int32))
        _fetch1(o)
        ts = []
        for _ in range(3):
            o = f(jnp.zeros((8,), jnp.int32))
            t0 = time.perf_counter()
            _fetch1(o)
            ts.append(time.perf_counter() - t0)
        _RTT = min(ts)
    return _RTT


def _time(fn, *args, iters=10):
    out = fn(*args)
    _fetch1(out)
    rtt = _rtt()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch1(out)
    return max(0.0, time.perf_counter() - t0 - rtt) / iters * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 163840
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, M, N).astype(np.int32))
    tabs = [jnp.asarray(rng.standard_normal(M).astype(np.float32))
            for _ in range(5)]
    tabi = jnp.asarray(rng.integers(0, 1 << 30, M).astype(np.int32))
    wgt = jnp.asarray((rng.random(N) + 0.5).astype(np.float32))

    def consume(*xs):
        acc = jnp.zeros((), jnp.float32)
        for x in xs:
            acc = acc + jnp.sum(x.astype(jnp.float32) * wgt)
        return acc

    for k in (1, 2, 3, 5):
        @jax.jit
        def takes(idx, *tabs, k=k):
            return consume(*(t[idx] for t in tabs[:k]))
        t = _time(takes, idx, *tabs)
        print(f"takes k={k}: {t:7.3f} ms  {t*1e6/N/k:6.2f} ns/idx  "
              f"({t*1e6/N:6.2f} ns/slot)", flush=True)

    # sorted indices (slab-extraction-like locality)
    sidx = jnp.asarray(np.sort(rng.integers(0, M, N)).astype(np.int32))

    @jax.jit
    def takes_sorted(idx, t0, t1, t2):
        return consume(t0[idx], t1[idx], t2[idx])
    t = _time(takes_sorted, sidx, *tabs[:3])
    print(f"takes k=3 sorted: {t:7.3f} ms  {t*1e6/N/3:6.2f} ns/idx",
          flush=True)

    # full W=1 df body: 5 takes (col + bhi + blo + ahi + alo) + product
    from mh_spgemm_tpu.ops import bucketed as bk
    ai = jnp.asarray(rng.integers(0, M, N).astype(np.int32))

    @jax.jit
    def w1_body(src, ai, col, bh, bl, ah, al):
        valid = src >= 0
        srcc = jnp.where(valid, src, 0)
        K = jnp.where(valid, col[srcc], np.int32(2**31 - 1))
        bv = (bh[srcc], bl[srcc])
        AV = (ah[ai], al[ai])
        prod = bk._product(AV, bv, valid, True)
        return consume(K, prod[0], prod[1], valid)
    t = _time(w1_body, idx, ai, tabi, *tabs[:4])
    print(f"W=1 df body: {t:7.3f} ms  {t*1e6/N:6.2f} ns/slot", flush=True)


if __name__ == "__main__":
    main()


def extra():
    N = 163840
    M = 262144
    rng = np.random.default_rng(1)
    from mh_spgemm_tpu.ops import bucketed as bk
    idx = jnp.asarray(rng.integers(0, M, N).astype(np.int32))
    wgt = jnp.asarray((rng.random(N) + 0.5).astype(np.float32))
    for k in (2, 4):
        words = jnp.asarray(
            rng.integers(0, 1 << 30, M * k).astype(np.int32))

        @jax.jit
        def slicek(idx, words, k=k):
            g = bk._words_gather(words, idx, k)
            acc = jnp.zeros((), jnp.float32)
            for j in range(k):
                acc = acc + jnp.sum(g[:, j].astype(jnp.float32) * wgt)
            return acc
        t = _time(slicek, idx, words)
        print(f"slice-gather k={k}: {t:7.3f} ms  {t*1e6/N:6.2f} ns/idx",
              flush=True)

    # scatter-set (seed scatters): N values into an RW-sized target
    for E in (32768, 163840):
        eidx = jnp.asarray(
            rng.choice(N, E, replace=False).astype(np.int32))
        vals = jnp.asarray(rng.standard_normal(E).astype(np.float32))
        w2 = jnp.asarray((rng.random(N) + 0.5).astype(np.float32))

        @jax.jit
        def scat(eidx, vals):
            z = jnp.zeros((N,), jnp.float32).at[eidx].set(
                vals, mode="drop")
            return jnp.sum(z * w2)
        t = _time(scat, eidx, vals)
        print(f"scatter E={E}: {t:7.3f} ms  {t*1e6/E:6.2f} ns/idx",
              flush=True)

    # hold-scan pass cost on flat [N] (3 payload planes, 8 passes)
    s = jnp.asarray(rng.random(N) < 0.3)
    p1 = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    @jax.jit
    def hold(s, p1):
        v2 = p1.reshape(-1, 128)
        acc = v2
        for _ in range(8):
            acc = acc + jnp.roll(acc, 1, axis=1)
        return jnp.sum(acc * wgt.reshape(-1, 128))
    t = _time(hold, s, p1)
    print(f"8 roll-add passes flat: {t:7.3f} ms "
          f"({t*1e6/N/8:5.2f} ns/slot/pass)", flush=True)


extra()
