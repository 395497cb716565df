"""bench.py absolute-calibration probe (VERDICT r7 #2 / ADVICE r7).

BENCH_r07 went on record ~1.8x inflated with `load_contaminated: false`
because the spread-median statistic compares a gate's samples to each
other and is blind to UNIFORM ambient slowdown. The fix is an absolute
reference: a fixed single-threaded sha256 kernel timed at run
start/mid/end, ratioed against a committed clean-hardware constant
(CAL_REF_S) and folded into the stamp. Live demonstration at commit
time (32 spinning processes saturating the host): clean probe ratio
1.01 -> stamp False; loaded probe ratio 2.06 -> stamp True, with
spread-median held at a "clean" 1.5 in both cases.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    CAL_MAX_RATIO,
    CAL_REF_S,
    SPREAD_MAX,
    STEAL_MAX_PCT,
    _cal_probe,
    _contamination_stamp,
    _cpu_jiffies,
    _steal_pct,
)


def test_stamp_clean_when_all_signals_clean():
    assert _contamination_stamp(False, 1.5, 1.0) is False


def test_stamp_flags_gate_give_up():
    assert _contamination_stamp(True, 1.0, 1.0) is True


def test_stamp_flags_spread():
    assert _contamination_stamp(False, SPREAD_MAX + 0.1, 1.0) is True


def test_stamp_flags_uniform_slowdown_via_cal_ratio():
    # The BENCH_r07 false-negative: spread clean, walls uniformly
    # inflated. The absolute ratio is the only signal that fires.
    assert _contamination_stamp(False, 1.55, CAL_MAX_RATIO + 0.1) is True


def test_stamp_flags_cpu_steal():
    # The attempt-2 blind spot (r8): both clean-looking signals (cal
    # ratio 1.06, spread under max) while a hypervisor neighbor stole
    # parallel capacity — the kernel's steal counter is the only signal
    # that sees it.
    assert (
        _contamination_stamp(False, 1.5, 1.0, STEAL_MAX_PCT + 1.0) is True
    )
    assert (
        _contamination_stamp(False, 1.5, 1.0, STEAL_MAX_PCT - 1.0) is False
    )


def test_steal_measurement_is_sane():
    snap = _cpu_jiffies()
    if snap is None:  # non-Linux
        assert _steal_pct(None) is None
        return
    # burn a little CPU so total jiffies advance
    x = 0
    for _ in range(10**7):
        x += 1
    pct = _steal_pct(snap)
    assert pct is None or 0.0 <= pct <= 100.0


def test_steal_pct_zero_elapsed_returns_none():
    # Identical (or regressed) snapshots have no elapsed jiffies: the
    # guard must return None, never divide by zero.
    assert _steal_pct((100, 5000), (100, 5000)) is None
    assert _steal_pct((100, 5000), (100, 4000)) is None
    assert _steal_pct(None, (100, 5000)) is None
    # a real interval computes the share
    assert _steal_pct((100, 5000), (150, 5100)) == 50.0


def test_max_phase_steal_catches_single_phase_burst():
    # A burst confined to one phase must not be diluted by quiet
    # phases — the stamp takes the per-phase MAX, mirroring the cal
    # probes' max-of-three.
    from bench import _max_phase_steal

    quiet = [(0, 0), (0, 10_000)]          # phase 1: 0% steal
    burst = [(3_000, 20_000)]              # phase 2: 30% steal
    assert _max_phase_steal(quiet + burst) == 30.0
    # averages over both phases would read 15% — under the 20% bar
    assert _max_phase_steal([(0, 0), (3_000, 20_000)]) == 15.0
    assert _max_phase_steal([None, (0, 10_000)]) is None
    assert _max_phase_steal([]) is None


def test_stamp_handles_missing_signals():
    # --headline-only early-abort paths may lack one signal; None must
    # neither crash nor flag.
    assert _contamination_stamp(False, None, None, None) is False
    assert _contamination_stamp(True, None, None, None) is True


def test_cal_probe_does_real_bounded_work():
    # The kernel is deterministic fixed work: it must take real time
    # (not optimized away) and terminate promptly. No upper-bound
    # assertion tied to CAL_REF_S — the test host may legitimately be
    # busy, and flakiness here would just train people to skip it.
    t = _cal_probe(inner_runs=1)
    assert 0.05 < t < 60.0


def test_committed_reference_is_sane():
    # Guard against an accidental unit change (ms vs s) in the constant.
    assert 0.1 < CAL_REF_S < 2.0
    assert 1.0 < CAL_MAX_RATIO < 3.0


def test_adaptive_floor_stopping_rule():
    """r10 signal floor (VERDICT r9 item 7): the stopping rule keeps
    sampling until the two SMALLEST draws agree within tol (min is
    corroborated), and always stops at max_n. With the rule in force, a
    recorded min was reproduced within 15% inside its own run — so a
    round-over-round min ratio >1.5x cannot be one-sided timer noise."""
    from bench import _needs_more_samples

    # fewer than two samples: always keep going
    assert _needs_more_samples([], tol=1.15, max_n=7)
    assert _needs_more_samples([1.0], tol=1.15, max_n=7)
    # two agreeing samples: done
    assert not _needs_more_samples([1.0, 1.1], tol=1.15, max_n=7)
    # min not corroborated (second-best 1.5x the best): keep sampling
    assert _needs_more_samples([1.0, 1.5], tol=1.15, max_n=7)
    # corroboration is about the two SMALLEST, not the latest draws:
    # a noisy tail after two agreeing fast samples changes nothing
    assert not _needs_more_samples([1.0, 9.0, 1.05], tol=1.15, max_n=7)
    # one fast outlier among slow agreeing draws: the fast MIN is the
    # claim, and it is uncorroborated -> more samples
    assert _needs_more_samples([5.0, 5.1, 1.0], tol=1.15, max_n=7)
    # hard cap regardless of agreement
    assert not _needs_more_samples([1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0],
                                   tol=1.15, max_n=7)
    # boundary: exactly tol-apart counts as agreement
    assert not _needs_more_samples([1.0, 1.15], tol=1.15, max_n=7)
