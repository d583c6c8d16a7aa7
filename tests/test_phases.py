"""utils/phases: the startup-attribution helper (round-4 verdict item
3 — the ~400 s unattributed warm start in the real eval CLI)."""

import json

from halva_tpu.utils import phases


def test_phase_records_and_accumulates(monkeypatch):
    monkeypatch.setattr(phases, "PHASES", {})
    with phases.phase("x"):
        pass
    with phases.phase("x"):
        pass
    phases.record("y", 1.5)
    assert set(phases.PHASES) == {"x", "y"}
    assert phases.PHASES["y"] == 1.5
    assert phases.PHASES["x"] >= 0.0


def test_dump_env_gated(tmp_path, monkeypatch):
    monkeypatch.setattr(phases, "PHASES", {"a": 2.0})
    monkeypatch.delenv("HALVA_PHASE_JSON", raising=False)
    phases.dump()  # no-op without the env
    out = tmp_path / "p.json"
    monkeypatch.setenv("HALVA_PHASE_JSON", str(out))
    phases.dump()
    assert json.loads(out.read_text()) == {"a": 2.0}
