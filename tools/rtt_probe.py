#!/usr/bin/env python
"""One-shot host-window probe: actor ping RTT + single-core CPU canary.

The shared VM's IPC latency is bimodal (~0.3 ms quiet, 2-14 ms degraded);
every sequential serving number is RTT-bound, so bench/scaling runs should
be stamped with — and ideally scheduled by — this probe.  Prints one JSON
line.
"""
import json
import time

import ray


@ray.remote
class _Ping:
    def ping(self) -> int:
        return 0


def probe() -> dict:
    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", num_cpus=2, include_dashboard=False,
                 log_to_driver=False)
    a = _Ping.remote()
    ray.get(a.ping.remote())
    t0 = time.perf_counter()
    for _ in range(200):
        ray.get(a.ping.remote())
    rtt_ms = (time.perf_counter() - t0) * 5.0
    ray.kill(a)
    # single-core CPU canary (the BASELINE.md fixed-size kernel shape)
    import numpy as np

    x = np.random.default_rng(0).normal(size=(1200, 1200))
    t0 = time.perf_counter()
    for _ in range(3):
        x = np.tanh(x @ x.T / 1200.0)
    cpu_sec = time.perf_counter() - t0
    if owns:
        ray.shutdown()
    return {"rtt_ms": round(rtt_ms, 3), "cpu_canary_sec": round(cpu_sec, 3)}


if __name__ == "__main__":
    print(json.dumps(probe()))
