"""bench.py harness logic — synthetic floor fixtures, no Spark.

The regressions gate records at REGRESSION_RATIO (2x) but the inline
contention retry used to fire only at PRIOR_RATIO (3x), leaving a
2x-3x blind band where loaded-host noise was published as a regression
without ever getting a quiet-host shot (BENCH_r12's
q_join_bloom_prefilter: 2.03x under loadavg 9.68, re-measured 1.29x on
a settled box). `_retry_gate_trips` closes the band: anything tripping
the GATE threshold gets one quiet-host wait + fresh reps before the
field is emitted; the min stands, so surviving entries are real.
"""

from __future__ import annotations

import bench


def test_gate_trips_thresholds():
    # no floor -> heuristic disabled
    assert not bench._gate_trips(100.0, None)
    floor = 2.0
    # exactly at the ratio is NOT above it
    assert not bench._gate_trips(bench.REGRESSION_RATIO * floor, floor)
    assert bench._gate_trips(bench.REGRESSION_RATIO * floor + 0.01, floor)
    # absolute slack: a 0.2s floor at 4.5x is still jitter, not signal
    assert not bench._gate_trips(0.9, 0.2)
    # both conditions needed: big absolute delta under the ratio is fine
    assert not bench._gate_trips(19.0, 10.0)


def test_retry_gate_trips_clears_noise_and_keeps_real_regressions():
    prior = {"q_noise": 1.5, "q_real": 1.0, "q_fast": 1.0}
    # q_noise: 2.07x (the r12 blind band); q_real: 3.0x genuine;
    # q_fast: clean — must not be touched
    timings = {"q_noise": 3.1, "q_real": 3.0, "q_fast": 1.1}
    fresh = {"q_noise": 1.6, "q_real": 2.9}
    calls = {"quiet": 0, "runs": []}

    def run_once(name):
        calls["runs"].append(name)
        return fresh[name]

    def await_quiet():
        calls["quiet"] += 1

    retried = bench._retry_gate_trips(timings, prior, run_once, await_quiet)

    assert set(retried) == {"q_noise", "q_real"}
    assert calls["quiet"] == 2  # one full quiet wait per tripped query
    assert calls["runs"].count("q_noise") == 3  # fresh reps, min-of
    assert calls["runs"].count("q_fast") == 0
    assert timings["q_fast"] == 1.1
    # the noise cleared on a quiet host -> gate no longer trips
    assert timings["q_noise"] == 1.6
    assert not bench._gate_trips(timings["q_noise"], prior["q_noise"])
    # the real regression survived its quiet retry -> published
    assert timings["q_real"] == 2.9
    assert bench._gate_trips(timings["q_real"], prior["q_real"])


def test_retry_gate_trips_min_stands():
    # a retry can only LOWER a timing — a slower fresh run never
    # replaces the recorded min
    timings = {"q": 2.5}
    prior = {"q": 1.0}
    retried = bench._retry_gate_trips(
        timings, prior, lambda n: 9.9, lambda: None
    )
    assert retried == ["q"]
    assert timings["q"] == 2.5


def test_retry_gate_trips_no_floor_no_retry():
    timings = {"q_new": 50.0}
    retried = bench._retry_gate_trips(
        timings, {}, lambda n: 0.0, lambda: None
    )
    assert retried == []
    assert timings["q_new"] == 50.0


def test_steal_pct_since_last_call(monkeypatch):
    """The steal sampler reads /proc/stat deltas since its previous
    call (zero added latency), updates the run-wide high-water, and
    degrades to 0.0 (loadavg-only gating) when /proc/stat is missing."""
    readings = iter(
        [
            (1000, 10),  # baseline call -> 0.0 (no prior)
            (2000, 110),  # +1000 total, +100 steal -> 10%
            (2000, 110),  # no tick movement -> 0.0, not div-by-zero
            None,  # /proc/stat gone -> 0.0
        ]
    )
    monkeypatch.setattr(bench, "_read_cpu_stat", lambda: next(readings))
    monkeypatch.setattr(bench, "_last_cpu_stat", None)
    monkeypatch.setattr(bench, "_steal_max", 0.0)
    assert bench._steal_pct() == 0.0
    assert bench._steal_pct() == 10.0
    assert bench._steal_pct() == 0.0
    assert bench._steal_pct() == 0.0
    assert bench._steal_max == 10.0


def test_await_quiet_host_waits_out_steal(monkeypatch):
    """loadavg alone can look quiet while another tenant steals the
    CPUs (r13: identical reps 2-8x slow at loadavg < 2). The quiet
    gate must hold until steal ALSO drops under STEAL_GATE_PCT."""
    steals = iter([50.0, 20.0, 1.0])  # two contended samples, then calm
    sleeps = []
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (1.0, 1.0, 1.0))
    monkeypatch.setattr(bench, "_steal_pct", lambda: next(steals))
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    load = bench._await_quiet_host(wait_s=600)
    assert sleeps == [15, 15]  # waited exactly until the calm sample
    assert load == 1.0


def test_sample_env_reports_load_and_steal(monkeypatch):
    """r14 additive annotation: each query's min carries the loadavg
    and steal window that produced it, so one contaminated measurement
    is attributable without a full re-run."""
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (2.345, 0.0, 0.0))
    monkeypatch.setattr(bench, "_steal_pct", lambda: 7.25)
    env = bench._sample_env()
    assert env == {"load1": 2.35, "steal_pct": 7.2}


def test_await_quiet_host_samples_steal_even_when_load_fails(monkeypatch):
    """ADVICE r13: the old short-circuit `load <= GATE and _steal_pct()`
    skipped steal sampling whenever loadavg alone failed, stretching
    later steal windows. Every loop iteration must advance the
    /proc/stat baseline."""
    calls = []
    loads = iter([99.0, 99.0, 1.0])
    monkeypatch.setattr(
        bench.os, "getloadavg", lambda: (next(loads), 0.0, 0.0)
    )
    monkeypatch.setattr(
        bench, "_steal_pct", lambda: calls.append(1) or 0.0
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._await_quiet_host(wait_s=600)
    # three iterations (two loaded, one quiet) -> three steal samples
    assert len(calls) == 3
