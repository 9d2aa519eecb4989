"""R5 cycle pacing: sleep-the-remainder arithmetic (no Spark, no wall
clock — injected clock/sleep)."""

from __future__ import annotations

from newsraag_crawler_spark.streaming.pacing import CyclePacing, paced_cycles


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


def test_sleeps_interval_minus_cycle_duration():
    clock = FakeClock()
    slept = []

    def cycle(i):
        clock.advance(700.0)  # each cycle "takes" 700 s

    def sleep(s):
        slept.append(s)
        clock.advance(s)

    res = paced_cycles(cycle, interval_s=10_800.0, max_cycles=3, clock=clock, sleep=sleep)
    assert slept == [10_100.0, 10_100.0]  # no sleep after the last cycle
    assert res[0] == CyclePacing(0, 700.0, 10_100.0)
    assert res[-1].slept_s == 0.0


def test_overrunning_cycle_never_sleeps_negative():
    clock = FakeClock()
    slept = []

    def cycle(i):
        clock.advance(12_000.0)  # cycle longer than the interval

    res = paced_cycles(
        cycle, interval_s=10_800.0, max_cycles=2, clock=clock, sleep=slept.append
    )
    assert slept == [0.0]
    assert res[0].slept_s == 0.0 and res[0].duration_s == 12_000.0


def test_cycle_index_passed_through():
    seen = []
    paced_cycles(seen.append, interval_s=1.0, max_cycles=3,
                 clock=FakeClock(), sleep=lambda s: None)
    assert seen == [0, 1, 2]
