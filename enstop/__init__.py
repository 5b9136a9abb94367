"""``enstop`` namespace alias — a literal drop-in for the reference package.

Code written against lmcinnes/enstop (``from enstop import EnsembleTopics``,
``from enstop.plsa import plsa_fit``, ...) runs unchanged against the
TPU-native implementation in :mod:`enstop_tpu`.  Every submodule here is a
re-export; the implementations live in enstop_tpu (see ARCHITECTURE.md).

Reference surface: enstop/__init__.py:1-7.
"""

from enstop_tpu.plsa import PLSA
from enstop_tpu.streamed_plsa import StreamedPLSA
from enstop_tpu.block_parallel_plsa import BlockParallelPLSA
from enstop_tpu.distributed_plsa import DistributedPLSA
from enstop_tpu.cuda_plsa import GPUPLSA
from enstop_tpu.enstop_ import EnsembleTopics
from enstop_tpu.utils import log_lift, mean_log_lift, coherence, mean_coherence

__all__ = [
    "PLSA",
    "StreamedPLSA",
    "BlockParallelPLSA",
    "DistributedPLSA",
    "GPUPLSA",
    "EnsembleTopics",
    "log_lift",
    "mean_log_lift",
    "coherence",
    "mean_coherence",
]
