"""Tiered assertion tests (reference: ``common/assert.h`` levels)."""

import pytest

from dlaf_tpu.utils.asserts import assert_heavy, assert_moderate, dlaf_assert


def test_levels(monkeypatch):
    monkeypatch.setenv("DLAF_ASSERT_LEVEL", "2")
    dlaf_assert(True)
    assert_moderate(True)
    with pytest.raises(AssertionError):
        dlaf_assert(False, "boom", x=3)
    with pytest.raises(AssertionError):
        assert_moderate(False)
    assert_heavy(False)  # level 2: heavy disabled

    monkeypatch.setenv("DLAF_ASSERT_LEVEL", "3")
    with pytest.raises(AssertionError, match="x=3"):
        assert_heavy(False, "heavy", x=3)

    monkeypatch.setenv("DLAF_ASSERT_LEVEL", "0")
    dlaf_assert(False)  # everything off
