"""Persistent XLA compilation cache + first-dispatch compile accounting.

The reference has no equivalent (PyTorch eager pays no compile); under XLA
every process pays a full trace+compile for each program it dispatches —
minutes per model over a remote-TPU tunnel, and it recurs for every expid,
tuner trial, bench run, and serving restart. JAX's persistent compilation
cache keys serialized executables by (HLO, compile options, backend), so
identical programs compile once PER MACHINE, not once per process.

``enable_compilation_cache`` is called from RankModel.__init__ (i.e. every
training/serving flow) — opt out with ``compile_cache=False`` in the model
config or ``FUXICTR_COMPILE_CACHE=0`` in the environment; redirect with
``compile_cache_dir`` / ``FUXICTR_COMPILE_CACHE_DIR``.

``timed_first_dispatch`` wraps a jitted callable to log one line for its
first call — "compile[label]: Xs (persistent cache hit|miss)" — so every
run shows where its one-time compile tax went and whether the cache paid.
"""

import logging
import os
import time

_CACHE_DIR = None
_ANNOUNCED = False


def enable_compilation_cache(cache_dir=None):
    """Point JAX's persistent compilation cache at a durable directory.

    Idempotent; returns the cache dir, or None when disabled/unavailable.
    Entries below 0.5s compile time are not persisted (keeps unit-test
    CPU runs from spraying thousands of tiny files).
    """
    global _CACHE_DIR, _ANNOUNCED
    mode = os.environ.get("FUXICTR_COMPILE_CACHE", "auto").lower()
    if mode in ("0", "false", "off"):
        return None
    if _CACHE_DIR is not None:
        if cache_dir and os.path.abspath(cache_dir) != _CACHE_DIR:
            logging.warning(
                "compile cache already initialized at %s; ignoring "
                "compile_cache_dir=%s (the cache dir is process-wide — "
                "set it on the FIRST model, or via "
                "FUXICTR_COMPILE_CACHE_DIR)", _CACHE_DIR, cache_dir)
        return _CACHE_DIR
    import jax
    if mode != "1" and jax.default_backend() == "cpu":
        # XLA:CPU AOT deserialization is machine-feature-pinned (reloading
        # an entry warns about SIGILL risk and is genuinely unsafe across
        # hosts), and CPU compiles are cheap anyway — the tax this cache
        # kills is the remote-accelerator compile. Force with
        # FUXICTR_COMPILE_CACHE=1.
        return None
    cache_dir = os.path.abspath(
        cache_dir
        or os.environ.get("FUXICTR_COMPILE_CACHE_DIR")
        or os.path.expanduser("~/.cache/fuxictr_tpu/jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as exc:           # read-only fs, old jax, ...
        logging.warning("persistent compile cache unavailable: %s", exc)
        return None
    _CACHE_DIR = cache_dir
    if not _ANNOUNCED:
        _ANNOUNCED = True
        logging.info("Persistent compile cache: %s (%d entries)",
                     cache_dir, _entries())
    return cache_dir


def _entries():
    if not _CACHE_DIR or not os.path.isdir(_CACHE_DIR):
        return -1
    try:
        return len(os.listdir(_CACHE_DIR))
    except OSError:
        return -1


def timed_first_dispatch(fn, label):
    """Wrap a jitted fn: log trace+compile wall time and persistent-cache
    hit/miss for its FIRST dispatch, then pass calls straight through.

    The first jit dispatch blocks through tracing + XLA compilation (even
    on async backends), so its wall time IS the compile tax; a new cache
    file appearing during it means the executable was compiled fresh
    (miss), none appearing with the cache on means it was deserialized
    (hit).
    """
    state = {"first": True}

    def wrapped(*args, **kwargs):
        if not state["first"]:
            return fn(*args, **kwargs)
        state["first"] = False
        n0 = _entries()
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        dt = time.perf_counter() - t0
        n1 = _entries()
        if n0 < 0:
            status = "persistent cache off"
        elif n1 > n0:
            status = "persistent cache miss"
        elif dt >= 0.5:
            status = "persistent cache hit"
        else:                      # too cheap to have been persisted at all
            status = "sub-threshold compile"
        logging.info("compile[%s]: %.1fs (%s)", label, dt, status)
        return out

    return wrapped
