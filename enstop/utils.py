"""Alias of :mod:`enstop_tpu.utils` at the reference import path."""

from enstop_tpu.utils import *  # noqa: F401,F403
from enstop_tpu.utils import __all__  # noqa: F401
