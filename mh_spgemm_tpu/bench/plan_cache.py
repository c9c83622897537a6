"""Capacity cache: persist the per-row nnz(C) counts an engine learns on
its first run so later *processes* skip the cold program entirely.

Why this exists: the engines' one dynamic unknown is nnz(C) (per class /
per row).  Within a process the plan caches it after one totals fetch, but
a fresh process must otherwise compile BOTH the cold learning program and
the warm fused program — and through this environment's remote-compile
tunnel each large program costs ~70-80 s to build (the round-3 driver
bench timed out on exactly this, 16 matrices x 2 cold compiles).  With the
learned ``crow`` on disk, a fresh process warms the plan host-side
(ops/bucketed.warm_plan_from_crow / ops/blockdense.warm_blockplan_from_crow)
and compiles only the fused program: half the cold cost, identical
compiled code and identical measured steady state.

Records are keyed by matrix identity (name, shape, nnz, a structural
digest of the CSR pattern) plus every config field that shapes the plan,
plus a planner version salt — a stale or foreign record can only miss, not
mis-warm.  Lookup order: $MHSPGEMM_PLAN_CACHE, the repo's committed
``data/plan_cache/``, then ``~/.cache/mh_spgemm_tpu/plan_cache``; saves go
to the first writable of the same list.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

import numpy as np

# Bump when plan_buckets / plan_blockdense change class or capacity
# semantics: orphans every existing record.
PLAN_CACHE_VERSION = 1

_REPO_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "data", "plan_cache")
_HOME_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                         "mh_spgemm_tpu", "plan_cache")


def _dirs() -> list:
    env = os.environ.get("MHSPGEMM_PLAN_CACHE")
    out = [env] if env else []
    return out + [_REPO_DIR, _HOME_DIR]


def _pattern_digest(A) -> str:
    """Cheap structural digest of a CSR pattern: full ptr array plus a
    deterministic sample of col.  Collisions require an identically-sized,
    identically-rowed matrix — combined with the config key and version
    salt that is close enough to impossible for a benchmark cache."""
    h = hashlib.sha1()
    ptr = np.ascontiguousarray(np.asarray(A.ptr, dtype=np.int64))
    h.update(ptr.tobytes())
    col = np.asarray(A.col)
    step = max(1, col.size // 4096)
    h.update(np.ascontiguousarray(col[::step].astype(np.int64)).tobytes())
    return h.hexdigest()[:16]


def cache_key(name: str, A, engine: str, config, df: bool) -> str:
    parts = (PLAN_CACHE_VERSION, name, A.M, A.N, A.nnz,
             _pattern_digest(A), engine, str(config.vdtype), bool(df),
             config.min_bucket_width, config.bucket_area_cap,
             config.dma_fill, config.esc_tail, config.df32,
             config.ozaki, config.planned)
    return hashlib.sha1(repr(parts).encode()).hexdigest()[:24]


def _find(key: str) -> Optional[str]:
    for d in _dirs():
        p = os.path.join(d, f"{key}.npz")
        if os.path.exists(p):
            return p
    return None


def try_warm(state, name: str, A, engine: str, config) -> bool:
    """Warm ``state.plan`` from a cached record.  Returns True on a hit."""
    df = bool(getattr(state, "df", False))
    path = _find(cache_key(name, A, engine, config, df))
    if path is None:
        return False
    try:
        with np.load(path) as z:
            crow = z["crow"]
            if crow.shape[0] != state.plan.m:
                return False
            if engine == "bucketed":
                from ..ops.bucketed import warm_plan_from_crow
                warm_plan_from_crow(state.plan, crow)
            elif engine == "blockdense":
                from ..ops.blockdense import warm_blockplan_from_crow
                warm_blockplan_from_crow(state.plan, crow,
                                         int(z["ext_area"]),
                                         int(z["ext_nplanes"]))
            else:
                return False
        return True
    except Exception:
        return False  # a broken record is a miss, never a failure


def save(state, name: str, A, engine: str, config) -> Optional[str]:
    """Persist the learned counts from a plan that has run cold.  Returns
    the path written, or None (nothing learned yet / nowhere writable)."""
    plan = state.plan
    if getattr(plan, "crow_h", None) is None:
        return None
    df = bool(getattr(state, "df", False))
    key = cache_key(name, A, engine, config, df)
    if _find(key):
        return None
    rec = {"crow": plan.crow_h.astype(np.int32)}
    if engine == "blockdense":
        if plan.ext_area is None:
            return None
        rec["ext_area"] = np.int64(plan.ext_area)
        rec["ext_nplanes"] = np.int64(plan.ext_nplanes)
    for d in _dirs():
        try:
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"{key}.npz")
            with open(path, "wb") as f:
                np.savez_compressed(f, **rec)
            return path
        except OSError:
            continue
    return None
