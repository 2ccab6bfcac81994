"""Shared utilities."""

from pogs_tpu.utils.precision import highest_precision

__all__ = ["highest_precision"]
