"""Fused FFN-block kernel (ops/ffn_block.py): on-chip train-step A/B.

Runs bench_pretrain's exact protocol (B=32 x S=512, bf16, scan_unroll=12,
chained 10-step timing) once per backend in separate subprocesses (the
backend env var is read at trace time, so one process per backend keeps
the jit caches honest).

Usage: python scripts/profile_ffn_block.py           # both backends
       python scripts/profile_ffn_block.py one xla   # single (internal)
"""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)


def run_one(backend: str):
    os.environ["RLMG_FFN_BACKEND"] = backend
    import bench
    bench._setup_cache()
    tps, el = bench.bench_pretrain()
    print(json.dumps({"backend": backend, "tok_s": round(tps, 1),
                      "step_s": round(el, 4)}))


def main(backends=("xla", "pallas")):
    out = {}
    for backend in backends:
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["RLMG_FFN_BACKEND"] = backend
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one", backend],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=2400)
        line = [l for l in p.stdout.strip().splitlines()
                if l.startswith("{")]
        if not line:
            print(f"{backend} FAILED:\n{p.stdout[-2000:]}\n{p.stderr[-4000:]}")
            continue
        r = json.loads(line[-1])
        out[backend] = r
        print(f"{backend}: {r['tok_s']:,.0f} tok/s ({r['step_s']*1e3:.1f} ms/step)")
    if len(out) >= 2:
        base = list(out)[0]
        for b in list(out)[1:]:
            speedup = out[b]["tok_s"] / out[base]["tok_s"]
            print(f"{b}/{base}: {speedup:.3f}x")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(sys.argv[2])
    elif len(sys.argv) > 1:
        main(tuple(sys.argv[1:]))
    else:
        main()
