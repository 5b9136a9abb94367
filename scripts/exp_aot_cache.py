"""Probe: can compiled executables be serialized/reloaded on this backend?

Every fresh process pays the remote-compile relay (30 s - 10+ min for the
production fit programs; the XLA persistent compilation cache does NOT cover
this backend's executables).  jax.experimental.serialize_executable pickles
the PjRt executable itself — if the axon plugin implements
SerializeExecutable, a disk cache of compiled fit programs would eliminate
the per-process compile cost entirely.

Run on the real TPU (relay alive):  python scripts/exp_aot_cache.py
Writes/reads /tmp/enstop_aot_probe.pkl and reports timings.
"""

import pickle
import sys
import time

import numpy as np


def main():
    import os

    import jax

    if os.environ.get("ENSTOP_AOT_CPU"):
        # env-var platform selection may not stick (sitecustomize pre-imports
        # jax with the axon plugin); config.update after import always works
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental.serialize_executable import (
        deserialize_and_load,
        serialize,
    )

    print("backend:", jax.default_backend(), file=sys.stderr)

    @jax.jit
    def f(x, y):
        # while_loop + matmul: the shape of the production fit programs
        def body(c):
            i, acc = c
            return i + 1, acc @ y
        _, out = jax.lax.while_loop(lambda c: c[0] < 8, body, (0, x))
        return out.sum()

    x = jnp.ones((512, 512), jnp.float32)
    y = jnp.eye(512, dtype=jnp.float32) * 0.5

    t0 = time.time()
    compiled = f.lower(x, y).compile()
    print(f"compile: {time.time() - t0:.1f}s", file=sys.stderr)

    try:
        t0 = time.time()
        ser, in_tree, out_tree = serialize(compiled)
        with open("/tmp/enstop_aot_probe.pkl", "wb") as fh:
            pickle.dump((ser, in_tree, out_tree), fh)
        print(f"serialize: {time.time() - t0:.1f}s, {len(ser)} bytes",
              file=sys.stderr)
    except Exception as e:
        print("SERIALIZE UNSUPPORTED:", type(e).__name__, str(e)[:200],
              file=sys.stderr)
        return 1

    try:
        t0 = time.time()
        with open("/tmp/enstop_aot_probe.pkl", "rb") as fh:
            ser, in_tree, out_tree = pickle.load(fh)
        loaded = deserialize_and_load(ser, in_tree, out_tree)
        out = float(np.asarray(loaded(x, y)))
        dt = time.time() - t0
        want = float(np.asarray(compiled(x, y)))
        assert abs(out - want) < 1e-3, (out, want)
        print(f"DESERIALIZE+RUN OK: {dt:.1f}s (vs fresh compile above); "
              f"result {out}", file=sys.stderr)
        print("-> run again in a FRESH process to confirm the reload path "
              "skips the remote compile", file=sys.stderr)
        return 0
    except Exception as e:
        print("DESERIALIZE UNSUPPORTED:", type(e).__name__, str(e)[:200],
              file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
