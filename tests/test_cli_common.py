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


def test_jax_cache_helper(tmp_path, monkeypatch):
    """enable_compilation_cache: explicit dir is created and set on the
    jax config; 'off' is a no-op returning None; 'auto' honors
    $G2V_JAX_CACHE_DIR. The suite's own cache dir is restored after."""
    import jax

    from gesture2vec_tpu.utils.jaxcache import enable_compilation_cache

    old = jax.config.jax_compilation_cache_dir
    try:
        d = str(tmp_path / "xla")
        assert enable_compilation_cache(d) == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d

        assert enable_compilation_cache("off") is None
        assert jax.config.jax_compilation_cache_dir == d  # untouched

        env_d = str(tmp_path / "env_xla")
        monkeypatch.setenv("G2V_JAX_CACHE_DIR", env_d)
        assert enable_compilation_cache("auto") == env_d
        assert os.path.isdir(env_d)
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
