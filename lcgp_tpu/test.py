"""Install-verification test entry (reference test.py:4-25)."""
from __future__ import annotations

import os


def test(level: int = 0):
    """Run the packaged test-suite.  Returns True if all tests passed."""
    import pytest

    VERBOSITY = [0, 1, 2]
    if level not in VERBOSITY:
        raise ValueError(f"level must be in {VERBOSITY}")

    here = os.path.dirname(os.path.abspath(__file__))
    tests_dir = os.path.join(os.path.dirname(here), 'tests')
    if not os.path.isdir(tests_dir):
        tests_dir = os.path.join(here, 'tests')
    return pytest.main([f"--verbosity={level}", tests_dir]) == 0
