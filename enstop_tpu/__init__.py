"""enstop_tpu — TPU-native ensemble topic modeling (pLSA + EnsTop capabilities).

A ground-up JAX/XLA/Pallas rebuild of the capabilities of lmcinnes/enstop: fast
pLSA via matmul-form EM on the MXU, mesh-sharded and streamed variants, and
ensemble topic modeling with stable-topic clustering.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the compiled EM-loop programs are expensive
# to build (tens of seconds on TPU) and fully reusable across processes.
# Opt out with ENSTOP_TPU_NO_COMPILE_CACHE=1 or by pre-setting a cache dir.
if not _os.environ.get("ENSTOP_TPU_NO_COMPILE_CACHE"):
    try:
        if not _jax.config.jax_compilation_cache_dir:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/enstop_tpu/xla"),
            )
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is a best-effort optimization
        pass

from .models.plsa import PLSA
from .ops.driver import PreparedCounts, plsa_fit, plsa_refit, prepare_counts
from .ops.metrics import coherence, log_lift, mean_coherence, mean_log_lift
from .utils import normalize, standardize_input

__version__ = "0.2.0"

__all__ = [
    "PLSA",
    "prepare_counts",
    "PreparedCounts",
    "plsa_fit",
    "plsa_refit",
    "coherence",
    "mean_coherence",
    "log_lift",
    "mean_log_lift",
    "normalize",
    "standardize_input",
]


def __getattr__(name):
    # Lazy exports keep import light; the full surface matches enstop's __init__
    # (reference __init__.py:1-7) plus TPU-specific additions.
    if name in ("StreamedPLSA",):
        from .models.streamed import StreamedPLSA

        return StreamedPLSA
    if name in ("BlockParallelPLSA", "DistributedPLSA"):
        from .models import mesh as _mesh_models

        return getattr(_mesh_models, name)
    if name in ("TPUPLSA", "GPUPLSA"):
        from .models.accelerated import TPUPLSA

        return TPUPLSA
    if name == "EnsembleTopics":
        from .models.ensemble import EnsembleTopics

        return EnsembleTopics
    if name in ("PreparedSell", "prepare_sell"):
        from .ops import sell as _sell

        return getattr(_sell, name)
    if name in ("ensemble_fit", "ensemble_of_topics"):
        from .models import ensemble as _ens

        return getattr(_ens, name)
    raise AttributeError(name)
