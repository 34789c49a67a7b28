"""Persistent compilation cache plumbing (utils/compcache.py)."""
import jax

from mpcgpu_tpu.utils.compcache import enable_persistent_cache


def test_enable_persistent_cache(tmp_path):
    prev = {
        "jax_compilation_cache_dir": jax.config.jax_compilation_cache_dir,
        "jax_persistent_cache_min_compile_time_secs":
            jax.config.jax_persistent_cache_min_compile_time_secs,
        "jax_persistent_cache_min_entry_size_bytes":
            jax.config.jax_persistent_cache_min_entry_size_bytes,
    }
    try:
        d = tmp_path / "cache"
        got = enable_persistent_cache(d)
        assert got == str(d)
        assert d.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(d)
        # cache-everything thresholds (remote round-trips make even small
        # compiles slow)
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
        assert jax.config.jax_persistent_cache_min_entry_size_bytes == -1
    finally:  # global jax config: don't leak a deleted tmp dir to the suite
        for k, v in prev.items():
            jax.config.update(k, v)
