"""Attribute-access config dict (API-parity module).

Reference parity: visreps/config.py:1-21 (ConfigDict — kept for API
compatibility; the run path uses visreps_tpu.core.config.Config).
"""
from visreps_tpu.core.config import Config as ConfigDict  # noqa: F401

__all__ = ["ConfigDict"]
