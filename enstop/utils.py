"""Alias of :mod:`enstop_tpu.utils` at the reference import path.

The reference's ``enstop/utils.py`` also hosts the topic-quality metrics
(coherence / log-lift, reference utils.py:44-273); here they live in
:mod:`enstop_tpu.ops.metrics`, so this alias re-exports them to keep
``from enstop.utils import coherence`` working unchanged.
"""

from enstop_tpu.utils import *  # noqa: F401,F403
from enstop_tpu.utils import __all__ as _utils_all  # noqa: F401
from enstop_tpu.ops.metrics import (  # noqa: F401
    coherence,
    log_lift,
    mean_coherence,
    mean_log_lift,
)

__all__ = list(_utils_all) + [
    "coherence",
    "mean_coherence",
    "log_lift",
    "mean_log_lift",
]
