"""burst_tpu: TPU-native optimal short-read DNA aligner.

A from-scratch re-design of the capabilities of knights-lab/BURST for
TPU hardware: bit-parallel Myers scan kernels over a sharded reference
database, exact tie-aware rescoring, and BURST-compatible databases,
modes, and blast6 output.
"""
import os

__version__ = "0.1.0"


def _enable_compile_cache():
    """Persistent XLA compilation cache: kernel shapes are canonical, so
    compiles amortize across processes (important under remote-compile
    TPU backends where a single compile costs seconds)."""
    if os.environ.get("BURST_TPU_NO_CACHE"):
        return
    try:
        import jax
        cache = os.environ.get("BURST_TPU_CACHE_DIR",
                               os.path.expanduser("~/.cache/burst_tpu_xla"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_enable_compile_cache()
