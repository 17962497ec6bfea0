"""Loopback network-path observables (VERDICT r6 #7): both benches must
produce positive, internally consistent throughput numbers — they feed
BENCH_DETAIL's ``network_path`` entry every round."""

from __future__ import annotations

from tools.net_microbench import bench_http, bench_tcp


def _check(res: dict) -> None:
    assert res["streams"] >= 1
    assert res["secs"] > 0
    assert res["gbytes"] > 0
    assert res["gbps_bytes"] > 0
    # throughput must be bytes/secs (rounding tolerance)
    assert abs(res["gbps_bytes"] - res["gbytes"] / res["secs"]) < 0.05 * max(
        1.0, res["gbps_bytes"]
    )


def test_loopback_tcp():
    _check(bench_tcp(streams=2, duration=0.3))


def test_loopback_http():
    _check(bench_http(streams=2, duration=0.3))
