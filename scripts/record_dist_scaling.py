"""Record the distributed scaling artifact for the round (VERDICT
round-1 item 10): dist_bench over the virtual CPU mesh at D=1/2/4/8
for each exchange strategy, plus the real chip at D=1 when available,
into data/DIST_SCALING_r{N}.json.

Run:  python scripts/record_dist_scaling.py [round_number]
(CPU part always runs; the TPU part is skipped if the chip is busy.)

Methodology caveat (measured, round 3): this host has ONE physical CPU
core, so the 8-device virtual mesh fully serialises — D>1 times measure
TOTAL WORK (padding + exchange volume + per-shard compute), never
latency hiding.  In particular a compute/comm-overlap strategy cannot
beat its non-overlapped twin here BY CONSTRUCTION (there is no second
execution resource to overlap onto); what the artifact can honestly
show for ``ragged_overlap`` is that its total work matches ``ragged``
(no overhead) while the overlap mechanism itself is validated by the
async-remote-copy unit tests (tests/test_remote_fetch.py).  Efficiency
is reported against a SHARED cross-strategy D=1 baseline (the best
single-device time) so strategies are comparable.
"""
import json
import subprocess
import sys

sys.path.insert(0, ".")

_CHILD = """
import json, sys
import jax
jax.config.update("jax_platforms", "%(platform)s")
%(devcfg)s
from mh_spgemm_tpu.bench.dist_bench import main
main(%(args)s)
"""


def run_child(platform: str, ndev: int, args: list) -> dict:
    code = _CHILD % {
        "platform": platform,
        "devcfg": (f'jax.config.update("jax_num_cpu_devices", {ndev})'
                   if platform == "cpu" else ""),
        "args": repr(args),
    }
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=3000)
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}
    for ln in p.stdout.splitlines():
        if ln.startswith("{"):
            return json.loads(ln)
    return {"error": p.stderr[-400:], "rc": p.returncode}


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "2"
    out = {"metric": "dist_scaling_artifact", "round": int(rnd),
           "note": ("virtual CPU mesh on a ONE-core host: D>1 times "
                    "measure total work (padding + exchange volume), "
                    "not latency hiding — an overlap strategy cannot "
                    "beat its non-overlapped twin here by construction. "
                    "Efficiency is vs the shared best D=1 time across "
                    "strategies. The TPU entry is the one-real-chip "
                    "D=1 point."),
           "cpu_mesh": {}, "tpu": None}
    for strategy in ("allgather", "ragged", "ragged_overlap",
                     "grid2d"):
        out["cpu_mesh"][strategy] = run_child(
            "cpu", 8, ["scircuit", "--strategy", strategy,
                       "--iters", "3"])
        print(f"cpu {strategy}: done", flush=True)
    # shared cross-strategy baseline: the best D=1 time; per-strategy
    # self-relative efficiency hides absolute strategy cost
    t1 = min((r["devices"]["1"]["ms"]
              for r in out["cpu_mesh"].values()
              if isinstance(r, dict) and "devices" in r), default=None)
    if t1:
        out["shared_t1_ms"] = t1
        for r in out["cpu_mesh"].values():
            if isinstance(r, dict) and "devices" in r:
                for d, entry in r["devices"].items():
                    entry["efficiency"] = round(
                        t1 / (int(d) * entry["ms"]), 3)
    if "--no-tpu" not in sys.argv:
        out["tpu"] = run_child(
            "axon", 1, ["scircuit", "--strategy", "ragged",
                        "--iters", "2"])
        print("tpu D=1: done", flush=True)
    path = f"data/DIST_SCALING_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
