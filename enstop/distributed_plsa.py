"""Alias of :mod:`enstop_tpu.distributed_plsa` at the reference import path."""

from enstop_tpu.distributed_plsa import *  # noqa: F401,F403
from enstop_tpu.distributed_plsa import __all__  # noqa: F401
