"""Alias of :mod:`enstop_tpu.enstop_` at the reference import path."""

from enstop_tpu.enstop_ import *  # noqa: F401,F403
from enstop_tpu.enstop_ import __all__  # noqa: F401
