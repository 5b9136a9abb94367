"""Disk cache of compiled executables (ahead-of-time reload path).

Motivation: on the tunneled-TPU environment every fresh process pays a
REMOTE compile per program — measured 30 s to 10+ minutes for the
production while-loop fit programs, and the XLA persistent compilation
cache does not cover that backend's executables.
``jax.experimental.serialize_executable`` pickles the loaded PjRt
executable itself; when the backend's runtime supports it, caching the
serialized executable on disk lets a fresh process skip the remote
compile entirely (deserialize + load is local and takes milliseconds to
seconds).

This wraps the handful of *fit programs* (the expensive while-loop
compiles) behind :class:`AotCached`.  The wrapper is inert by default:

* ``ENSTOP_AOT_CACHE`` unset / ``"0"`` / ``"off"`` — passthrough to the
  ordinary jitted callable (zero behavior change, the shipped default);
* ``"1"`` / ``"on"`` — cache on; a serialize failure falls back to the
  plain compiled executable for that call and writes an ``unsupported-*``
  marker so later calls stop re-trying;
* ``"auto"`` — same as on, intended for scripted probes (bench.py and
  scripts/exp_aot_cache.py decide whether to export it).

Cache keys: sha256 of the lowered StableHLO text + jax version + backend
name + device kinds + physical device ids (serialized executables are
bound to specific devices).  Lowering is local tracing (cheap); only the
``.compile()`` step hits the remote relay, which is exactly the step a
disk hit skips.

RELIABILITY (learned from the BENCH_r03 crash): on this VM, executables
that deserialize cleanly in a FRESH process can still die at result
readback ("Buffer Definition Event: Function ... not found") — even
single-device CPU programs; the writing process is always fine, only the
reloading process fails, so in-process tests cannot catch it.  Every disk
hit is therefore verify-executed (run once on the real args + full host
readback) before being trusted; any failure unlinks the entry, warns, and
falls back to a plain compile.  The cross-process test lives at
tests/test_aot_cache.py (subprocess round-trip of the production fit
program).

No reference analog: this subsystem exists because of this environment's
remote-compile latency; a production TPU runtime compiles locally.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import threading
import warnings
import weakref
from pathlib import Path

__all__ = ["AotCached", "maybe_wrap", "cache_dir", "enabled", "clear_memory"]

# per-user by default: entries are pickles that get loaded and executed, so
# a world-writable shared directory (/tmp) would let another local user
# plant code; ENSTOP_AOT_DIR overrides for users who know their trust domain
_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "enstop_tpu", "aot"
)
_LOCK = threading.Lock()
_WRAPPERS = weakref.WeakSet()
_UNSET = object()  # "no verified result available" sentinel


def cache_dir() -> Path:
    d = Path(os.environ.get("ENSTOP_AOT_DIR", _DEFAULT_DIR))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _env_flag(name, default="0"):
    return os.environ.get(name, default).strip().lower() in (
        "1", "on", "true", "auto", "yes",
    )


def enabled() -> bool:
    return _env_flag("ENSTOP_AOT_CACHE")


def _backend_tag() -> str:
    import jax

    devs = jax.devices()
    return "|".join(
        [
            "jax=" + jax.__version__,
            "backend=" + jax.default_backend(),
            "devices=" + ",".join(f"{d.device_kind}:{d.id}" for d in devs),
        ]
    )


def _marker_path(tag: str) -> Path:
    h = hashlib.sha256(tag.encode()).hexdigest()[:16]
    return cache_dir() / f"unsupported-{h}"


def _args_key(args):
    """Structure key for the in-memory executable table: tree structure +
    per-leaf (shape, dtype, sharding-spec) — a serialized executable only
    accepts the exact arg layout it was compiled for."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(args)
    parts = [str(treedef)]
    for leaf in leaves:
        shape = getattr(leaf, "shape", None)
        dtype = getattr(leaf, "dtype", type(leaf).__name__)
        sharding = getattr(leaf, "sharding", None)
        parts.append(f"{shape}|{dtype}|{sharding}")
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()


class AotCached:
    """Wrap a jitted callable with a disk cache of its serialized executables.

    Disabled (the default) it forwards to the jitted callable unchanged.
    Enabled, the first call per argument layout lowers locally, looks the
    program up on disk, and only compiles (remotely, on the tunneled
    backend) on a miss — writing the serialized executable back for the
    next process.
    """

    def __init__(self, jitted, name="prog"):
        self._jitted = jitted
        self.name = name
        self._mem = {}
        self.stats = {"disk_hits": 0, "disk_misses": 0, "mem_hits": 0}
        # WeakSet: the registry must not outlive the lru_cache'd builders
        # that own the wrappers (a strong list would pin every evicted
        # program's executables forever)
        _WRAPPERS.add(self)

    def __call__(self, *args):
        if not enabled():
            return self._jitted(*args)
        try:
            key = _args_key(args)
        except Exception:
            return self._jitted(*args)
        ex = self._mem.get(key)
        if ex is not None:
            self.stats["mem_hits"] += 1
            return ex(*args)
        ex, result = self._load_or_compile(args)
        if ex is None:
            return self._jitted(*args)
        # memoize only AFTER the executable has produced a verified (or
        # freshly-compiled) result — a disk-loaded executable that fails at
        # readback must never be pinned in _mem (it would poison every call)
        self._mem[key] = ex
        if result is not _UNSET:
            return result
        return ex(*args)

    # -- internals ---------------------------------------------------------

    def _load_or_compile(self, args):
        """Return ``(executable, result)``.

        ``executable`` is ``None`` when the plain jit path should be used.
        ``result`` is the output of a verified execution on ``args`` when one
        was performed (disk hits are always verify-executed before being
        trusted), else the ``_UNSET`` sentinel.
        """
        # multi-device executables: serialize/deserialize round-trips of
        # sharded CPU executables are UNRELIABLE in this jax version (a
        # reloaded program can execute but fail result readback with
        # "Buffer Definition Event: Function ... not found", and the failure
        # is nondeterministic across processes).  Only single-device
        # programs use the disk path unless explicitly overridden for
        # hardware where the round-trip has been validated.
        if not _env_flag("ENSTOP_AOT_MULTIDEV"):
            try:
                devs = set()
                import jax

                for leaf in jax.tree_util.tree_leaves(args):
                    sh = getattr(leaf, "sharding", None)
                    if sh is not None:
                        devs |= set(getattr(sh, "device_set", ()))
                if len(devs) > 1:
                    return None, _UNSET
            except Exception:
                return None, _UNSET
        try:
            tag = _backend_tag()
            if _marker_path(tag).exists():
                return None, _UNSET  # runtime rejected serialization earlier
            lowered = self._jitted.lower(*args)
            h = hashlib.sha256(
                (lowered.as_text() + "\n" + tag).encode()
            ).hexdigest()
        except Exception as e:  # lowering problems -> plain path
            warnings.warn(f"aot_cache: lowering failed ({e!r}); plain jit path")
            return None, _UNSET
        path = cache_dir() / f"{self.name}-{h[:24]}.pkl"
        bad = path.with_suffix(".bad")

        if path.exists() and not bad.exists():
            # VERIFY-ON-LOAD: on this VM even *single-device* CPU programs
            # that deserialize cleanly can die at result readback in a fresh
            # process ("Buffer Definition Event: Function ... not found" —
            # 100% reproducible, crashed BENCH_r03).  A loaded executable is
            # therefore only trusted after one real execution whose outputs
            # survive a host readback; any failure unlinks the entry and
            # falls through to the plain compile below.
            phase = "load"
            try:
                import jax
                from jax.experimental.serialize_executable import (
                    deserialize_and_load,
                )

                with open(path, "rb") as fh:
                    ser, in_tree, out_tree, dev_ids = pickle.load(fh)
                # deserialize_and_load defaults execution_devices to ALL of
                # the backend's devices; restore the assignment the program
                # was actually compiled for (e.g. 1 of 8 virtual devices)
                by_id = {d.id: d for d in jax.devices()}
                exec_devices = [by_id[i] for i in dev_ids]
                loaded = deserialize_and_load(
                    ser, in_tree, out_tree, execution_devices=exec_devices
                )
                phase = "execute"
                out = loaded(*args)
                import numpy as _np

                for leaf in jax.tree_util.tree_leaves(out):
                    _np.asarray(leaf)  # forces readback; the failing step
                self.stats["disk_hits"] += 1
                return loaded, out
            except Exception as e:
                if phase == "load":
                    warnings.warn(
                        f"aot_cache: stale/unloadable entry {path.name} "
                        f"({type(e).__name__}); recompiling"
                    )
                else:
                    warnings.warn(
                        f"aot_cache: entry {path.name} failed to "
                        f"execute+read back after reload "
                        f"({type(e).__name__}: {str(e)[:120]}); "
                        f"unlinking and recompiling"
                    )
                try:
                    path.unlink()
                except OSError:
                    pass
                if phase == "execute":
                    # the entry loaded fine but its executable dies at
                    # readback: THIS program does not survive a reload on
                    # this backend.  Remember it so later processes stop
                    # re-writing and re-trying a doomed entry (the
                    # write/fail cycle would otherwise repeat forever
                    # across process pairs).  Load-phase failures (corrupt
                    # file, jax upgrade) stay re-writable.
                    try:
                        bad.touch()
                    except OSError:
                        pass

        compiled = lowered.compile()
        self.stats["disk_misses"] += 1
        if bad.exists():
            # a previous process proved this program's serialized form dies
            # at readback after reload on this backend — don't re-write it
            return compiled, _UNSET
        try:
            from jax.experimental.serialize_executable import serialize

            ser, in_tree, out_tree = serialize(compiled)
        except Exception as e:
            # the runtime does not implement SerializeExecutable (or the
            # program is not serializable): record it and stop re-trying
            warnings.warn(
                f"aot_cache: serialize unsupported on this backend "
                f"({type(e).__name__}: {str(e)[:120]}); disk cache disabled"
            )
            try:
                _marker_path(_backend_tag()).touch()
            except Exception:
                pass
            return compiled, _UNSET
        tmp = None
        try:
            # private jax internals — a rename here must NOT be mistaken for
            # "serialize unsupported" (the permanent marker above); it only
            # means this entry cannot be written
            dev_ids = [
                d.id
                for d in compiled._executable.xla_executable.local_devices()
            ]
            with _LOCK:
                fd, tmp = tempfile.mkstemp(dir=str(cache_dir()), suffix=".tmp")
                with os.fdopen(fd, "wb") as fh:
                    pickle.dump((ser, in_tree, out_tree, dev_ids), fh)
                os.replace(tmp, path)
        except Exception as e:
            if tmp is not None:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
            warnings.warn(
                f"aot_cache: could not write cache entry {self.name} "
                f"({type(e).__name__}: {str(e)[:120]}); continuing uncached"
            )
        return compiled, _UNSET


def maybe_wrap(jitted, name="prog"):
    """Wrap a jitted fit program.  Cheap; the on/off decision is per call,
    so exporting ``ENSTOP_AOT_CACHE=1`` affects already-built programs."""
    return AotCached(jitted, name=name)


def clear_memory():
    """Drop the in-process executable tables (tests)."""
    for w in _WRAPPERS:
        w._mem.clear()
