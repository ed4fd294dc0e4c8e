"""Two-cluster-size scaling evidence (BASELINE.md gate).

The north rule's N-vs-4N-executor criterion cannot use a real cluster in
this sandbox; the agreed proxy (BASELINE.md) is the identical job on the
identical input at local[8] vs local[32] on this 32-core box:

    efficiency = (throughput@32 / throughput@8) / 4

Runs bench.py in fresh subprocesses (a JVM's master is fixed at startup),
parses the JSON lines, writes BENCH/BASELINE.md.

Usage: PYTHONPATH=/root/repo python tools/scaling_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["PYTHONPATH"] = REPO
    # best-of-3 of the pipeline only: single runs on a shared box are too
    # noisy for a scaling ratio (hyperfine-style repetition, like the
    # reference's own published numbers)
    env.setdefault("SPARK_GRAFT_BENCH_REPS", "3")
    env.setdefault("SPARK_GRAFT_BENCH_ONLY", "pipeline_synth")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    # warm the corpus cache once so both runs read identical input
    r8 = run_bench(8, sf_dir)
    r32 = run_bench(32, sf_dir)

    tput8 = r8["throughput_turns_per_sec"]
    tput32 = r32["throughput_turns_per_sec"]
    eff = (tput32 / tput8) / 4.0

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — scaling evidence (local[8] vs local[32] proxy)

Per BASELINE.md: the N-vs-4N-executor scaling criterion is evidenced by the
identical pipeline job on identical input at two parallelism levels on this
32-core box. Input: deterministic synthetic transcript corpus
({r32.get('synth_turns', '?')} turns, seed=42), sf={r32['sf']}.

| parallelism | pipeline wall (s) | throughput (turns/s) |
|---|---|---|
| local[8]  | {r8['queries']['pipeline_synth']} | {tput8} |
| local[32] | {r32['queries']['pipeline_synth']} | {tput32} |

**Scaling efficiency = (throughput@32 / throughput@8) / 4 = {eff:.3f}**
(gate: ≥ 0.8)

Full bench JSON:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(md)
    print(md)
    print(f"written: {path}")


if __name__ == "__main__":
    main()
