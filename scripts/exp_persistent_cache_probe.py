"""Can the jax PERSISTENT compilation cache reproduce the readback failure?

VERDICT r03 weak #6 / next-round item 5: `enstop_tpu/__init__.py` enables the
jax persistent compilation cache for every importer, and round 3 proved that
the OTHER cross-process reuse mechanism (`serialize_executable` loaded-
executable pickles, enstop_tpu/aot_cache.py) dies at result readback in a
fresh process ("Buffer Definition Event ... not found").  The two mechanisms
are different layers — the persistent cache stores backend compilation
artifacts keyed by HLO and re-LOADS them through the normal compile path,
while serialize_executable pickles the already-loaded PjRt executable — but
"benign" deserved a test, not an assumption.

Method: K fresh subprocesses each import enstop_tpu (enabling the persistent
cache), run the SAME small production fit, and read the factors back to host.
Process 1 warms the cache; processes 2..K reload compiled executables from it
(visible as `cpu_aot_loader.cc` E-lines on CPU).  Any nonzero rc or readback
mismatch = the persistent cache CAN reproduce the failure and import-time
enablement must be gated.  All-zero rcs with cache-hit evidence = documented
benign.

Run: python scripts/exp_persistent_cache_probe.py  (CPU by default; on a live
relay it probes the tpu backend's cache the same way).
"""

import json
import os
import subprocess
import sys
import tempfile

CHILD = """
import sys
import jax
if {force_cpu}:
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import scipy.sparse as sp
import enstop_tpu  # enables the persistent compilation cache
from enstop_tpu import PLSA
assert jax.config.jax_compilation_cache_dir, "persistent cache not enabled"
# cache EVERY program (the library default only caches >=1s compiles, which
# a small CPU fit can dodge -- that would make this probe vacuous)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
X = sp.csr_matrix(np.random.RandomState(0).poisson(0.6, (64, 96)).astype(np.int64))
m = PLSA(n_components=4, n_iter=10, random_state=0).fit(X)
emb = np.asarray(m.embedding_)  # full host readback — the failing step in the
comp = np.asarray(m.components_)  # serialize_executable repro
assert np.isfinite(emb).all() and np.isfinite(comp).all()
np.save(sys.argv[1], comp)
import os
cdir = jax.config.jax_compilation_cache_dir
n_entries = sum(len(fs) for _, _, fs in os.walk(cdir)) if os.path.isdir(cdir) else 0
print("child ok; cache entries now:", n_entries)
"""


def main():
    force_cpu = os.environ.get("ENSTOP_PROBE_TPU", "") == ""
    k = int(os.environ.get("ENSTOP_PROBE_RUNS", 3))
    with tempfile.TemporaryDirectory() as td:
        # isolated cache dir so run 1 is a guaranteed cold start
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        env["ENSTOP_TPU_NO_COMPILE_CACHE"] = ""
        comps, rcs, cache_lines = [], [], []
        for i in range(k):
            out = os.path.join(td, f"c{i}.npy")
            env2 = dict(env, XDG_CACHE_HOME=td)  # HOME-independent isolation
            env2["ENSTOP_PROBE_CACHE_DIR"] = td
            child = (
                "import os\n"
                f"os.environ['HOME'] = {td!r}\n"  # ~/.cache -> isolated dir
                + CHILD.format(force_cpu=force_cpu)
            )
            r = subprocess.run(
                [sys.executable, "-c", child, out],
                env=env2, capture_output=True, text=True, timeout=540,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            rcs.append(r.returncode)
            hits = [ln for ln in r.stderr.splitlines()
                    if "cpu_aot_loader" in ln or "persistent cache" in ln.lower()]
            cache_lines.append(len(hits))
            entries = [ln for ln in r.stdout.splitlines()
                       if "cache entries now" in ln]
            print(f"# run {i}: rc={r.returncode}, cache-related stderr "
                  f"lines={len(hits)}, {entries}", file=sys.stderr, flush=True)
            if r.returncode != 0:
                print(r.stderr[-2000:], file=sys.stderr)
            else:
                import numpy as np

                comps.append(np.load(out))
        agree = None
        if len(comps) == k and k > 1:
            import numpy as np

            agree = all(np.array_equal(comps[0], c) for c in comps[1:])
        benign = all(rc == 0 for rc in rcs) and agree is True
        print(json.dumps({
            "metric": "persistent_cache_cross_process_probe",
            "runs": k,
            "rcs": rcs,
            "cache_evidence_lines": cache_lines,
            "factors_bitwise_equal": agree,
            "verdict": ("benign: all fresh-process reloads executed and read "
                        "back" if benign
                        else "FAILURE REPRODUCED — gate the import-time "
                             "enablement"),
        }))
        # rc mirrors the verdict: silently-corrupted factors (rc 0 but
        # disagreeing results) must read as failure to rc-based callers too
        return 0 if benign else 1


if __name__ == "__main__":
    raise SystemExit(main())
