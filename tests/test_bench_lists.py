"""bench.py's query lists stay consistent with the registry.

HEADLINE grows by hand every round; a typo'd key would silently
vanish from the bench (`if key in queries` skips it) and the round's
artifact would under-report with no error anywhere. These pins turn
that silent drop into a test failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
import bench


def test_every_headline_key_is_a_registry_key():
    registry = set(entry_mod.queries())
    missing = [k for k in bench.HEADLINE if k not in registry]
    assert not missing, (
        f"HEADLINE names non-registry keys (silently skipped by the "
        f"bench loop): {missing}")


def test_core_queries_is_a_headline_subset():
    assert bench.CORE_QUERIES <= set(bench.HEADLINE)


def test_high_variance_keys_are_benched():
    # a HIGH_VARIANCE entry that is not in HEADLINE exempts nothing
    assert bench.HIGH_VARIANCE <= set(bench.HEADLINE)


def test_section_lists_are_headline_subsets():
    assert set(bench.SKEW_QUERIES) <= set(entry_mod.queries())
    assert set(bench.SF10_QUERIES) <= set(entry_mod.queries())


def test_headline_has_no_duplicates():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
