"""Record the distributed scaling artifact for the round (VERDICT
round-1 item 10): dist_bench over the virtual CPU mesh at D=1/2/4/8
for each exchange strategy, plus the real chip at D=1 when available,
into data/DIST_SCALING_r{N}.json.

Run:  python scripts/record_dist_scaling.py [round_number]
(CPU part always runs; the TPU part is skipped if the chip is busy.)
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
           "note": ("virtual CPU mesh validates mechanism + relative "
                    "strategy cost, not ICI speed; the TPU entry is the "
                    "one-real-chip D=1 point"),
           "cpu_mesh": {}, "tpu": None}
    for strategy in ("allgather", "ragged", "ragged_overlap"):
        out["cpu_mesh"][strategy] = run_child(
            "cpu", 8, ["scircuit", "--strategy", strategy,
                       "--iters", "2"])
        print(f"cpu {strategy}: done", flush=True)
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
