"""Tiered assertions.

Equivalent of the reference's ``common/assert.h``: three levels —
``dlaf_assert`` (always on), ``assert_moderate`` and ``assert_heavy``
(debug tiers), controlled by ``DLAF_ASSERT_LEVEL`` (0=off, 1=always-on
only, 2=+moderate, 3=+heavy; default 2).  Messages include the values
being checked (the reference prints operands and source location).
"""

from __future__ import annotations

import os


def _level() -> int:
    try:
        return int(os.environ.get("DLAF_ASSERT_LEVEL", "2"))
    except ValueError:
        return 2


def dlaf_assert(cond: bool, msg: str = "", **values) -> None:
    """Always-on invariant check (reference ``DLAF_ASSERT``)."""
    if _level() >= 1 and not cond:
        raise AssertionError(_fmt(msg, values))


def assert_moderate(cond: bool, msg: str = "", **values) -> None:
    """Cheap debug check (reference ``DLAF_ASSERT_MODERATE``)."""
    if _level() >= 2 and not cond:
        raise AssertionError(_fmt(msg, values))


def assert_heavy(cond: bool, msg: str = "", **values) -> None:
    """Expensive debug check (reference ``DLAF_ASSERT_HEAVY``)."""
    if _level() >= 3 and not cond:
        raise AssertionError(_fmt(msg, values))


def _fmt(msg, values):
    parts = [msg] if msg else []
    parts += [f"{k}={v!r}" for k, v in values.items()]
    return "; ".join(parts) or "assertion failed"
