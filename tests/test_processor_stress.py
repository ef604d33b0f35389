"""Processor runtime under concurrency stress: many simultaneous
processors, racing aborts, hostile observers/hooks — every processor must
terminate with exactly one Result, observers must see the Result before any
waiter wakes, and no thread may deadlock.

The reference gets this layer from scala-processor; ours is hand-built
(runtime/processor.py), so the properties are pinned here."""

import threading
import time

import numpy as np
import pytest

from strugatzki_tpu.runtime.processor import (Aborted, Processor, Progress,
                                              Result)


def _worker_body(steps=200, sleep=0.0005):
    def body(proc: Processor):
        acc = 0.0
        for i in range(steps):
            proc.check_aborted()
            acc += np.sin(i)
            proc.set_progress((i + 1) / steps)
            if sleep:
                time.sleep(sleep)
        return acc
    return body


def test_many_concurrent_processors_with_racing_aborts():
    events = {}
    procs = []
    for i in range(24):
        ev = []
        events[i] = ev
        procs.append(Processor(_worker_body(), name=f"p{i}",
                               observer=ev.append).start())
    # abort every third processor from a separate thread, racing the bodies
    def aborter():
        for i, p in enumerate(procs):
            if i % 3 == 0:
                p.abort()
            time.sleep(0.001)
    t = threading.Thread(target=aborter)
    t.start()
    t.join()
    for i, p in enumerate(procs):
        res = p.ready(timeout=30)
        assert p.done()
        # exactly one terminal Result event, delivered as the LAST event
        finals = [e for e in events[i] if isinstance(e, Result)]
        assert len(finals) == 1 and events[i][-1] is finals[0]
        if res.failure is not None:
            assert isinstance(res.failure, Aborted) and i % 3 == 0
        else:
            # non-aborted runs completed with full progress
            assert res.value == pytest.approx(
                sum(np.sin(j) for j in range(200)))
            assert p.progress == pytest.approx(1.0)


def test_result_dispatched_before_waiters_wake_under_load():
    """The Result-before-waiters ordering must hold for every one of many
    racing waiter threads, not just the single-waiter regression case."""
    seen_at_wake = []
    ev = []
    proc = Processor(_worker_body(steps=50), name="ordered",
                     observer=ev.append)

    def waiter():
        proc.ready(timeout=30)
        seen_at_wake.append(any(isinstance(e, Result) for e in list(ev)))

    threads = [threading.Thread(target=waiter) for _ in range(16)]
    for t in threads:
        t.start()
    proc.start()
    for t in threads:
        t.join(timeout=30)
        assert not t.is_alive()
    assert seen_at_wake == [True] * 16


def test_hostile_observer_and_hooks_cannot_break_completion():
    ev = []

    def observer(e):
        ev.append(e)
        raise RuntimeError("observer bomb")

    proc = Processor(_worker_body(steps=10), name="hostile",
                     observer=observer)
    proc.on_complete(lambda r: (_ for _ in ()).throw(RuntimeError("hook")))
    fail_hook_ran = []
    proc.on_failure(lambda r: fail_hook_ran.append(r))
    proc.start()
    assert proc.result(timeout=30) == pytest.approx(
        sum(np.sin(j) for j in range(10)))
    assert any(isinstance(e, Result) for e in ev)
    assert not fail_hook_ran            # success -> failure hooks skipped


def test_abort_before_start_and_failure_hooks():
    ran = []
    proc = Processor(_worker_body(), name="prestart-abort",
                     observer=lambda e: None)
    proc.on_failure(lambda r: ran.append("failure"))
    proc.on_complete(lambda r: ran.append("complete"))
    proc.abort()
    proc.start()
    res = proc.ready(timeout=30)
    assert isinstance(res.failure, Aborted) and res.is_aborted
    # both hook kinds ran, each exactly once
    assert sorted(ran) == ["complete", "failure"]
