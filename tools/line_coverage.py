"""Minimal line-coverage measurement without coverage.py.

The CI coverage job (pytest-cov + Coveralls, .github/workflows/ci.yml)
runs where pip is available; this tool exists to measure a number in
hermetic environments (like the build sandbox) so the CI threshold
(--cov-fail-under) can be set from data.  It uses py3.12's
``sys.monitoring`` LINE events, disabling each line after its first hit,
so the overhead on a long suite is a few percent, and approximates
coverage.py's line metric: executed lines / executable lines, where
executable lines are taken from each module's code objects (exactly the
lines the interpreter could report, so the two metrics agree up to
coverage.py's exclusion pragmas).

Usage:  python tools/line_coverage.py [pytest args...]
        (defaults to: tests/ -q)

Prints per-file and total percentages, plus one final line
``TOTAL_LINE_COVERAGE <pct>``.
"""
from __future__ import annotations

import dis
import os
import sys

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   'lcgp_tpu')

_hit: dict = {}
TOOL = sys.monitoring.PROFILER_ID


def _on_line(code, lineno):
    fn = code.co_filename
    if fn.startswith(PKG):
        _hit.setdefault(fn, set()).add(lineno)
    return sys.monitoring.DISABLE


def _executable_lines(path):
    """All line numbers the interpreter can attribute code to, from the
    compiled module's (recursive) code objects."""
    with open(path, encoding='utf-8') as f:
        src = f.read()
    lines = set()

    def walk(code):
        for _, _, ln in code.co_lines():
            if ln is not None:
                lines.add(ln)
        for const in code.co_consts:
            if hasattr(const, 'co_lines'):
                walk(const)
    try:
        walk(compile(src, path, 'exec'))
    except SyntaxError:
        return set()
    # exclude lines that are just docstrings/pass-throughs the same way
    # coverage.py does is out of scope; this is a measurement floor.
    return lines


def main():
    sys.monitoring.use_tool_id(TOOL, 'line_coverage')
    sys.monitoring.register_callback(TOOL, sys.monitoring.events.LINE,
                                     _on_line)
    sys.monitoring.set_events(TOOL, sys.monitoring.events.LINE)

    import pytest
    args = sys.argv[1:] or ['tests/', '-q']
    rc = pytest.main(args)

    sys.monitoring.set_events(TOOL, 0)
    sys.monitoring.free_tool_id(TOOL)

    total_exec = total_hit = 0
    rows = []
    for root, _, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith('.py'):
                continue
            path = os.path.join(root, f)
            ex = _executable_lines(path)
            if not ex:
                continue
            hit = _hit.get(path, set()) & ex
            total_exec += len(ex)
            total_hit += len(hit)
            rows.append((path[len(PKG) + 1:], len(hit), len(ex)))
    for name, h, e in rows:
        print(f'{name:40s} {h:5d}/{e:5d}  {100.0 * h / e:5.1f}%')
    pct = 100.0 * total_hit / max(1, total_exec)
    print(f'TOTAL_LINE_COVERAGE {pct:.1f}')
    return rc


if __name__ == '__main__':
    sys.exit(main())
