"""Transient-scratch placement (config.scratch_base) — ADVICE r4: the
UNSET default must be the safe system tempdir, never RAM-backed tmpfs;
/dev/shm is an explicit, free-space-checked opt-in."""
import os

from wse_ray.config import opt_in_fast_scratch, scratch_base


def test_scratch_base_defaults_to_system_tempdir(monkeypatch):
    monkeypatch.delenv("WSE_SCRATCH_BASE", raising=False)
    assert scratch_base() is None  # tempfile resolves the system default


def test_scratch_base_env_override(monkeypatch):
    monkeypatch.setenv("WSE_SCRATCH_BASE", "/tmp/custom_scratch")
    assert scratch_base() == "/tmp/custom_scratch"


def test_opt_in_fast_scratch_respects_existing(monkeypatch):
    monkeypatch.setenv("WSE_SCRATCH_BASE", "/somewhere/else")
    opt_in_fast_scratch(min_free_bytes=1)
    assert os.environ["WSE_SCRATCH_BASE"] == "/somewhere/else"


def test_opt_in_fast_scratch_free_space_gate(monkeypatch):
    if not os.path.isdir("/dev/shm"):
        return
    monkeypatch.delenv("WSE_SCRATCH_BASE", raising=False)
    opt_in_fast_scratch(min_free_bytes=1 << 60)  # absurd -> refuse
    assert "WSE_SCRATCH_BASE" not in os.environ
    opt_in_fast_scratch(min_free_bytes=1)
    assert os.environ.get("WSE_SCRATCH_BASE") == "/dev/shm"
