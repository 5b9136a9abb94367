"""Signature parity audit: reference classes/functions vs this package.

Parses the reference sources at /root/reference/enstop (AST — the reference
cannot be imported here: numba/hdbscan/umap are absent) and compares every
public estimator ``__init__`` and module-level function signature against
the drop-in surface exported by the ``enstop`` alias package.

Rules:
* every reference parameter must exist here with the same default, in the
  same positional order (extra TRAILING keyword-only additions are allowed
  and listed as "additions");
* known, documented deviations are whitelisted with the doc that records
  them.

Prints a report; exits 1 on any undocumented mismatch.  Run on demand:
    python scripts/audit_reference_signatures.py
"""

import ast
import inspect
import sys
from pathlib import Path

REF = Path("/root/reference/enstop")

# class -> (reference module, our import path)
CLASSES = {
    "PLSA": ("plsa.py", "enstop", "PLSA"),
    "StreamedPLSA": ("streamed_plsa.py", "enstop", "StreamedPLSA"),
    "BlockParallelPLSA": ("block_parallel_plsa.py", "enstop", "BlockParallelPLSA"),
    "DistributedPLSA": ("distributed_plsa.py", "enstop", "DistributedPLSA"),
    "GPUPLSA": ("cuda_plsa.py", "enstop", "GPUPLSA"),
    "EnsembleTopics": ("enstop_.py", "enstop", "EnsembleTopics"),
}

FUNCTIONS = {
    "plsa_fit": ("plsa.py", "enstop.plsa", "plsa_fit"),
    "plsa_refit": ("plsa.py", "enstop.plsa", "plsa_refit"),
    "plsa_init": ("plsa.py", "enstop.plsa", "plsa_init"),
    # per-module drop-in shims for the reference's variant drivers and the
    # module-public kernel symbols (VERDICT r03 'drop-in kernel-symbol shims')
    "streamed_plsa.plsa_fit":
        ("streamed_plsa.py", "enstop.streamed_plsa", "plsa_fit"),
    "block_parallel_plsa.plsa_fit":
        ("block_parallel_plsa.py", "enstop.block_parallel_plsa", "plsa_fit"),
    "distributed_plsa.plsa_fit":
        ("distributed_plsa.py", "enstop.distributed_plsa", "plsa_fit"),
    "cuda_plsa.plsa_fit": ("cuda_plsa.py", "enstop.cuda_plsa", "plsa_fit"),
    "plsa.plsa_e_step": ("plsa.py", "enstop.plsa", "plsa_e_step"),
    "plsa.plsa_m_step": ("plsa.py", "enstop.plsa", "plsa_m_step"),
    "plsa.plsa_m_step_w_sample_weight":
        ("plsa.py", "enstop.plsa", "plsa_m_step_w_sample_weight"),
    "plsa.log_likelihood": ("plsa.py", "enstop.plsa", "log_likelihood"),
    "plsa.plsa_refit_m_step":
        ("plsa.py", "enstop.plsa", "plsa_refit_m_step"),
    "ensemble_fit": ("enstop_.py", "enstop.enstop_", "ensemble_fit"),
    "ensemble_of_topics": ("enstop_.py", "enstop.enstop_", "ensemble_of_topics"),
    "normalize": ("utils.py", "enstop.utils", "normalize"),
    "coherence": ("utils.py", "enstop.utils", "coherence"),
    "mean_coherence": ("utils.py", "enstop.utils", "mean_coherence"),
    "log_lift": ("utils.py", "enstop.utils", "log_lift"),
    "mean_log_lift": ("utils.py", "enstop.utils", "mean_log_lift"),
    "standardize_input": ("utils.py", "enstop.utils", "standardize_input"),
}

# (name, param) -> documented deviation (all deliberate, all recorded)
WHITELIST = {
    ("BlockParallelPLSA", "n_row_blocks"):
        "tile grid -> device mesh; defaults derive from available devices "
        "(docs/API.md:44-52, models/mesh.py docstring)",
    ("BlockParallelPLSA", "n_col_blocks"): "same",
    ("DistributedPLSA", "n_row_blocks"): "same",
    ("DistributedPLSA", "n_col_blocks"): "same",
    ("EnsembleTopics", "parallelism"):
        "'dask' (threads) -> 'auto' (topology-aware: device-resident "
        "multinomial bootstraps on one device, one SPMD program across "
        "several; equivalence-proved) — docs/API.md:62-68; 'dask'/'joblib' "
        "remain honored as a real host thread pool on CPU backends",
    ("ensemble_fit", "parallelism"): "same",
    ("ensemble_of_topics", "parallelism"): "same",
    ("plsa_fit", "sample_weight"):
        "required positional -> optional None (fixes the upstream "
        "EnsembleTopics.transform TypeError, enstop_.py:847-854; "
        "ARCHITECTURE.md 'Reference defects')",
    ("plsa_refit", "sample_weight"): "same",
    ("streamed_plsa.plsa_fit", "sample_weight"): "same",
    ("plsa_init", "rng"):
        "np.random module default -> None through check_random_state "
        "(identical behavior: None uses the global numpy RNG)",
}


def ref_signature(module, name, is_class):
    import warnings

    with warnings.catch_warnings():
        # the reference's docstrings contain \s etc.; irrelevant here
        warnings.simplefilter("ignore", SyntaxWarning)
        tree = ast.parse((REF / module).read_text())
    for node in ast.walk(tree):
        if is_class and isinstance(node, ast.ClassDef) and node.name == name:
            for item in node.body:
                if isinstance(item, ast.FunctionDef) and item.name == "__init__":
                    return _params(item, skip_self=True)
            return []
        if not is_class and isinstance(node, ast.FunctionDef) and node.name == name:
            return _params(item := node, skip_self=False)
    raise KeyError(f"{name} not found in reference {module}")


def _params(fn, skip_self):
    out = []
    args = fn.args
    pos = list(args.args)
    if skip_self:
        pos = pos[1:]
    n_default = len(args.defaults)
    for i, a in enumerate(pos):
        d_idx = i - (len(pos) - n_default)
        default = (
            ast.unparse(args.defaults[d_idx]) if d_idx >= 0 else "<required>"
        )
        out.append((a.arg, default))
    for a, d in zip(args.kwonlyargs, args.kw_defaults):
        out.append((a.arg, ast.unparse(d) if d is not None else "<required>"))
    return out


def our_signature(import_path, name, is_class):
    mod = __import__(import_path, fromlist=[name])
    obj = getattr(mod, name)
    target = obj.__init__ if is_class else obj
    sig = inspect.signature(target)
    out = []
    for p in sig.parameters.values():
        if p.name in ("self",) or p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            continue
        default = "<required>" if p.default is inspect.Parameter.empty else repr(p.default)
        out.append((p.name, default))
    return out


def norm_default(s):
    """Normalize default reprs so ast.unparse and repr() compare equal."""
    s = s.strip()
    table = {"'": '"', }
    for a, b in table.items():
        s = s.replace(a, b)
    try:  # numeric literals: 1e-32 vs 1e-32, 0.001 vs 1e-3
        return repr(float(s))
    except ValueError:
        return s


def compare(name, ref, ours):
    problems, additions = [], []
    ours_names = [p for p, _ in ours]
    for i, (p, d) in enumerate(ref):
        if p not in ours_names:
            problems.append(f"missing param {p!r} (ref default {d})")
            continue
        j = ours_names.index(p)
        if j != i:
            problems.append(f"param {p!r} at position {j}, reference has {i}")
        od = ours[j][1]
        if norm_default(d) != norm_default(od):
            problems.append(f"default mismatch {p!r}: ref {d} vs ours {od}")
    for p, d in ours[len(ref):]:
        if p not in [r for r, _ in ref]:
            additions.append(f"{p}={d}")
    return problems, additions


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    bad = 0
    for name, (mod, imp, attr) in {**CLASSES, **FUNCTIONS}.items():
        is_class = name in CLASSES
        try:
            ref = ref_signature(mod, attr if not is_class else name, is_class)
            ours = our_signature(imp, attr, is_class)
        except Exception as e:
            print(f"{name}: AUDIT ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        problems, additions = compare(name, ref, ours)
        problems = [
            p for p in problems
            if (name, p.split("'")[1] if "'" in p else "") not in WHITELIST
        ]
        status = "OK" if not problems else "MISMATCH"
        print(f"{name}: {status}"
              + (f"  [+ additions: {', '.join(additions)}]" if additions else ""))
        for p in problems:
            print(f"    - {p}")
            bad += 1
    print(f"\n{'PASS' if bad == 0 else 'FAIL'}: {bad} undocumented mismatches")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
