"""instantavatar_tpu — TPU-native neural avatar framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tijiang13/InstantAvatar (monocular-video → animatable avatar in ~1 minute):
Instant-NGP hash-grid radiance field, occupancy-grid-accelerated volume
rendering, Fast-SNARF articulated deformation, SMPL body model, pose
optimization, and evaluation — built TPU-first (static shapes, masked
computation, pallas kernels for the hot ops, `jax.sharding` meshes for
multi-chip scaling).
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache, on by default.

    The fused 540px render and the train step compile in tens of
    seconds; the reference amortizes nothing (every run re-JITs its
    CUDA extensions' host code only). A warm cache removes recompiles
    across CLI invocations entirely — measured r4: the full bench
    warmup drops from ~7 min to seconds on a cache hit, and the
    60-second train target cannot absorb a cold compile at all.
    Opt out / redirect with JAX_COMPILATION_CACHE_DIR ("" disables).
    """
    import os

    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env is not None:  # user decided (set or explicitly disabled)
        return
    try:
        import jax

        cache = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "instantavatar_tpu", "xla_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # cache everything that takes >1 s to compile; tiny programs
        # stay out so the dir doesn't fill with trivia
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:  # pragma: no cover — never block import on cache
        pass


_enable_compilation_cache()
