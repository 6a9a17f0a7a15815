"""Driver benchmark: prints ONE JSON line.

Metric: entities scored per second per chip on the streaming top-k engine
(1M-entity LSE matrix, 256 queries, k=100) — the BASELINE.json headline.
``vs_baseline`` is the ratio against the self-measured CPU baseline stored
in benchmarks/cpu_baseline.json (the reference never published throughput;
see BASELINE.md). Target per BASELINE.json: >= 10x.
"""

import json
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The tunneled chip can wedge indefinitely (orphaned compiles block every
# later client; observed 4+ hour relay outages). A clean non-zero exit with
# a diagnostic beats hanging the driver: 20 min comfortably covers the
# worst observed cold compile at this size (~2 min) plus the run itself.
_WATCHDOG_SECS = 1200


def _watchdog():
    sys.stderr.write(
        "bench.py watchdog: no result after "
        f"{_WATCHDOG_SECS}s — TPU relay unreachable or a wedged remote "
        "compile; aborting instead of hanging the driver\n")
    sys.stderr.flush()
    os._exit(17)


def main() -> None:
    timer = threading.Timer(_WATCHDOG_SECS, _watchdog)
    timer.daemon = True      # never keep a finished bench process alive
    timer.start()
    # Persistent compile cache: first-run compile drops out of later runs
    # (measured 170.7s -> 2.3s for the stress train step); steady-state
    # timing below is unaffected (compile happens before the timed region).
    from sert_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from benchmarks.score_bench import measure_entities_per_sec

    # 400 sweeps per timed jit call amortizes the ~24 ms tunnel-dispatch RTT
    # (see benchmarks/NOTES.md; the RTT is an artifact of the remote-chip
    # tunnel, not of the engine — at 50 sweeps it still inflated every
    # sweep by ~0.5 ms) without inflating compile time (lax.scan compiles
    # once regardless of length). Measured ladder: 50 -> 4.87 ms/sweep,
    # 150 -> 4.47, 400 -> 4.34 (raw engine floor 4.17 + query-rep work).
    r = measure_entities_per_sec(num_entities=1_000_000, iters=5,
                                 sweeps_per_iter=400)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "benchmarks", "cpu_baseline.json")
    with open(baseline_path) as fh:
        cpu = json.load(fh)["entities_per_sec"]

    print(json.dumps({
        "metric": "entities_scored_per_sec_per_chip",
        "value": round(r["entities_per_sec"], 1),
        "unit": "entities/sec",
        "vs_baseline": round(r["entities_per_sec"] / cpu, 3),
    }))
    timer.cancel()


if __name__ == "__main__":
    main()
