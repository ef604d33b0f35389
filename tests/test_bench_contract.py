"""Driver-contract guards for bench.py's backend-outage behavior.

The driver runs ``python bench.py`` at round end and records the one JSON
line; during a relay outage (observed 2026-08-17: ``jax.devices()`` hangs
15+ min then raises UNAVAILABLE) the bench must exit non-zero WITHOUT
emitting a JSON record — an outage is not a perf number (docs/BENCH_LINK.md
§7).  These tests pin that logic without any hardware: ``_await_backend``
is exercised against monkeypatched device enumeration.
"""

import sys

import pytest


@pytest.fixture()
def bench_mod(monkeypatch):
    sys.modules.pop("bench", None)
    import bench
    yield bench
    sys.modules.pop("bench", None)


def test_await_backend_returns_devices(bench_mod, monkeypatch):
    import jax
    monkeypatch.setattr(jax, "devices", lambda: ["fake-dev"])
    assert bench_mod._await_backend(total_s=5.0) == ["fake-dev"]


def test_await_backend_outage_exits_nonzero(bench_mod, monkeypatch, capsys):
    import jax

    def raise_unavailable():
        raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")

    monkeypatch.setattr(jax, "devices", raise_unavailable)
    monkeypatch.setattr(bench_mod.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as exc:
        bench_mod._await_backend(total_s=0.5)
    assert exc.value.code == 1
    out, err = capsys.readouterr()
    # no JSON record may reach stdout on the outage path
    assert "{" not in out
    assert "backend unavailable" in err


def test_await_backend_hung_init_exits_nonzero(bench_mod, monkeypatch,
                                               capsys):
    """A HANGING ``jax.devices()`` (not an error: the init lock is held
    forever) must still exit 1 without JSON once the budget expires; the
    relay state is tracked by fresh-process probes, not by relaunching
    in-process threads (they would only queue on the held lock)."""
    import threading

    import jax

    release = threading.Event()
    probes = {"n": 0}

    def hang():
        release.wait(timeout=30.0)
        return ["dev"]

    def probe_down(timeout_s):
        probes["n"] += 1
        return False

    monkeypatch.setattr(jax, "devices", hang)
    monkeypatch.setattr(bench_mod, "_subprocess_probe", probe_down)
    monkeypatch.setattr(bench_mod.time, "sleep", lambda s: None)
    try:
        with pytest.raises(SystemExit) as exc:
            bench_mod._await_backend(total_s=0.2)
        assert exc.value.code == 1
        assert probes["n"] >= 1
        out, err = capsys.readouterr()
        assert "{" not in out
        assert "backend unavailable" in err
    finally:
        release.set()


def test_await_backend_hung_init_recovers(bench_mod, monkeypatch):
    """When a fresh-process probe reports the relay back UP, the parent's
    blocked init completes and its device list is returned."""
    import threading

    import jax

    release = threading.Event()

    def hang_until_released():
        release.wait(timeout=30.0)
        return ["dev-after-recovery"]

    def probe_up(timeout_s):
        release.set()          # "the relay came back"
        return True

    monkeypatch.setattr(jax, "devices", hang_until_released)
    monkeypatch.setattr(bench_mod, "_subprocess_probe", probe_up)
    monkeypatch.setattr(bench_mod.time, "sleep", lambda s: None)
    assert bench_mod._await_backend(total_s=20.0) == ["dev-after-recovery"]


def test_await_backend_retries_until_recovery(bench_mod, monkeypatch):
    """A flapping backend (fail, fail, up) must be retried within the
    budget rather than aborting on the first error."""
    import jax

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE")
        return ["dev"]

    monkeypatch.setattr(jax, "devices", flaky)
    monkeypatch.setattr(bench_mod.time, "sleep", lambda s: None)
    assert bench_mod._await_backend(total_s=30.0) == ["dev"]
    assert calls["n"] == 3
