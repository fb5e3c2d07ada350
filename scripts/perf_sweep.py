"""Sweep the factor-path experiment knobs on the b1024 headline config.

VERDICT r3 ask #2: close the MFU gap with evidence. The knobs
(ops/chol.py `_BLOCK`/`_PREC`, ops/kkt.py `_PREC_FACTOR`) are read from
the environment at import, so every config runs in a fresh subprocess;
the persistent compile cache makes repeats cheap. Each config reports
the headline b1024 time (bench.run), the solve rate, and the mean
iteration count -- a config only "wins" if it is faster at the SAME
solve rate and a statistically indistinguishable iteration count
(factor-side error is absorbed by refinement, but extra refinement or
Newton iterations would show up exactly here).

Usage: python scripts/perf_sweep.py            # all configs
       python scripts/perf_sweep.py quick      # baseline + best-guess only
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from proxsuite_tpu.utils.compile_cache import enable_compile_cache
import jax
on_tpu = "cpu" not in str(jax.devices()[0]).lower()
cache = ".jax_compile_cache_tpu" if on_tpu else ".jax_compile_cache"
enable_compile_cache(os.path.join(%(repo)r, cache), per_machine=not on_tpu)
import bench
t, solved, max_hit, mean_iter = bench.run(B=1024)
print("RESULT " + json.dumps({
    "ms_per_qp": round(1e3 * t / 1024, 4), "solved": solved,
    "max_iter_hit": max_hit, "mean_iter": round(mean_iter, 2)}))
"""

CONFIGS = [
    ("baseline block16/highest/highest", {}),
    ("block32", {"PROXSUITE_TPU_CHOL_BLOCK": "32"}),
    ("block8", {"PROXSUITE_TPU_CHOL_BLOCK": "8"}),
    ("factor high", {"PROXSUITE_TPU_FACTOR_PREC": "high"}),
    ("chol high", {"PROXSUITE_TPU_CHOL_PREC": "high"}),
    ("factor+chol high", {"PROXSUITE_TPU_FACTOR_PREC": "high",
                          "PROXSUITE_TPU_CHOL_PREC": "high"}),
    ("block32 + factor+chol high", {"PROXSUITE_TPU_CHOL_BLOCK": "32",
                                    "PROXSUITE_TPU_FACTOR_PREC": "high",
                                    "PROXSUITE_TPU_CHOL_PREC": "high"}),
]


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    configs = [CONFIGS[0], CONFIGS[-1]] if quick else CONFIGS
    results = []
    for name, env in configs:
        child_env = dict(os.environ, **env)
        p = subprocess.run([sys.executable, "-c", CHILD % {"repo": REPO}],
                           capture_output=True, text=True, env=child_env,
                           cwd=REPO, timeout=3600)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if not line:
            print(f"{name:34s} FAILED\n{p.stdout[-500:]}\n{p.stderr[-500:]}")
            continue
        r = json.loads(line[0][len("RESULT "):])
        r["config"] = name
        results.append(r)
        print(f"{name:34s} {r['ms_per_qp']:.4f} ms/QP  "
              f"solved={r['solved']}/1024  mean_iter={r['mean_iter']}",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
