"""Alias of :mod:`enstop_tpu.cuda_plsa` at the reference import path."""

from enstop_tpu.cuda_plsa import *  # noqa: F401,F403
from enstop_tpu.cuda_plsa import __all__  # noqa: F401
