"""Prebuilt model problems (used by examples, benchmarks, and the driver)."""

from .rbc import build_rbc_problem
from .kdv import build_kdv_problem
