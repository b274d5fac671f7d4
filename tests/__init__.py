"""lcgp_tpu test suite.

Lives at the repo top level for development (`pytest tests/`) and ships
inside the wheel as ``lcgp_tpu.tests`` (pyproject package-dir mapping) so
installed users can run ``lcgp_tpu.test()`` -> pytest --pyargs
lcgp_tpu.tests, mirroring the reference (src/lcgp/test.py:23).
"""
