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
