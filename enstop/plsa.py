"""Alias of :mod:`enstop_tpu.plsa` at the reference import path."""

from enstop_tpu.plsa import *  # noqa: F401,F403
from enstop_tpu.plsa import __all__  # noqa: F401
