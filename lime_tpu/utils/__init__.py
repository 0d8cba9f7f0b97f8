"""Utilities: timing, memory stats, dataset filters."""

from .timing import PhaseTimer  # noqa: F401
