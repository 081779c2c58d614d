"""Hardware parallel-scaling envelope for this sandbox VM.

Measures per-core throughput retention when going from N busy cores to 4N
busy cores using a Spark-free, shuffle-free pure-CPU workload (JSON parse +
dict walk — the same CPU profile as the extraction kernel). On dedicated
cluster nodes this ratio is ~1.0; on this VM, frequency scaling plus
hypervisor steal make cores measurably slower when more of them are busy,
which caps the *raw* wall-clock efficiency any CPU-bound job can show.

retention rho = per-core-throughput(high) / per-core-throughput(low), so
ideal job speedup low→high = (high/low) * rho and
normalized_efficiency = raw_speedup / ((high/low) * rho).

Each measurement is min-of-k to shed hypervisor-steal outliers.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

_DOC = json.dumps(
    {
        "@context": {"schema": "http://schema.org/", "knows": {"@id": "schema:knows"}},
        "@id": "http://ex.org/person-1",
        "name": "Agent 1",
        "knows": {"@id": "http://ex.org/person-2"},
        "tags": ["alpha", "beta", "gamma"],
    }
)


def _burn(n_iters: int) -> float:
    t0 = time.perf_counter()
    acc = 0
    for _ in range(n_iters):
        d = json.loads(_DOC)
        for k, v in d.items():
            if isinstance(v, dict):
                acc += len(v)
            elif isinstance(v, list):
                acc += len(v)
            elif isinstance(v, str) and v.startswith("http://"):
                acc += 1
    return time.perf_counter() - t0


def _unit_time(procs: int, n_iters: int, k: int) -> float:
    """Min over k trials of the mean per-process wall for `procs` concurrent
    processes each doing n_iters units."""
    best = float("inf")
    with mp.Pool(procs) as pool:
        for _ in range(k):
            walls = pool.map(_burn, [n_iters] * procs)
            best = min(best, sum(walls) / len(walls))
    return best


def measure_retention(low: int = 8, high: int = 32, n_iters: int = 60000, k: int = 5) -> dict:
    t_low = _unit_time(low, n_iters, k)
    t_high = _unit_time(high, n_iters, k)
    rho = t_low / t_high  # per-core throughput retention at high occupancy
    return {
        "low_procs": low,
        "high_procs": high,
        "unit_wall_low_s": round(t_low, 4),
        "unit_wall_high_s": round(t_high, 4),
        "retention_rho": round(rho, 4),
    }


if __name__ == "__main__":
    print(json.dumps(measure_retention()))
