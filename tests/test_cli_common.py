"""Shared CLI construction helpers."""
import os

from gesture2vec_tpu.cli._common import ensure_virtual_devices


def test_ensure_virtual_devices_replaces_stale_count(monkeypatch):
    """A stale --xla_force_host_platform_device_count exported by a
    previous run must be REPLACED, not kept (a too-small count makes
    make_mesh fail)."""
    monkeypatch.setenv(
        "XLA_FLAGS",
        "--xla_force_host_platform_device_count=4 --xla_other_flag")
    ensure_virtual_devices("dp=4,tp=2", "cpu")
    flags = os.environ["XLA_FLAGS"]
    assert "--xla_force_host_platform_device_count=8" in flags
    assert "device_count=4" not in flags
    assert "--xla_other_flag" in flags


def test_ensure_virtual_devices_noop_cases(monkeypatch):
    monkeypatch.setenv("XLA_FLAGS", "--keep")
    ensure_virtual_devices(None, "cpu")
    assert os.environ["XLA_FLAGS"] == "--keep"
    ensure_virtual_devices("dp=2", None)  # no platform override
    assert os.environ["XLA_FLAGS"] == "--keep"
