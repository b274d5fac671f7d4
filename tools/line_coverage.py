"""Zero-dependency line-coverage harness (sys.monitoring, PEP 669).

CI measures coverage with pytest-cov, but this host cannot install it; this
tool provides the local measurement the CI threshold (``--cov-fail-under`` in
``.github/workflows/ci.yml``) is calibrated against.  It is a *line* coverage
approximation: the denominator is every line emitted by the compiled code
objects of each ``lcgp_tpu`` module (docstring-only lines included, so it
reads slightly *lower* than coverage.py's statement coverage; branch coverage
reads lower still — calibrate thresholds with margin).

Overhead is one event per (code, line) location: the callback returns
``sys.monitoring.DISABLE`` after recording, so steady-state test code runs
unmonitored.

  PYTHONPATH=/root/repo python tools/line_coverage.py [pytest args...]

Prints per-file and total coverage, then exits with pytest's exit code.
"""
from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, 'lcgp_tpu')

_hits: dict[str, set[int]] = defaultdict(set)


def _on_line(code, line):
    fn = code.co_filename
    if fn.startswith(PKG):
        _hits[fn].add(line)
    return sys.monitoring.DISABLE


def _install():
    mon = sys.monitoring
    mon.use_tool_id(mon.COVERAGE_ID, 'lcgp-linecov')
    mon.register_callback(mon.COVERAGE_ID, mon.events.LINE, _on_line)
    mon.set_events(mon.COVERAGE_ID, mon.events.LINE)


def _possible_lines(path: str) -> set[int]:
    """All line numbers the compiled module can emit LINE events for."""
    with open(path, encoding='utf-8') as f:
        src = f.read()
    lines: set[int] = set()
    todo = [compile(src, path, 'exec')]
    while todo:
        co = todo.pop()
        lines.update(ln for _, _, ln in co.co_lines() if ln is not None)
        todo.extend(c for c in co.co_consts if hasattr(c, 'co_lines'))
    return lines


def report() -> float:
    rows = []
    tot_hit = tot_all = 0
    for dirpath, _dirs, files in os.walk(PKG):
        for name in sorted(files):
            if not name.endswith('.py'):
                continue
            path = os.path.join(dirpath, name)
            possible = _possible_lines(path)
            hit = _hits.get(path, set()) & possible
            tot_hit += len(hit)
            tot_all += len(possible)
            pct = 100.0 * len(hit) / len(possible) if possible else 100.0
            rows.append((os.path.relpath(path, ROOT), len(hit),
                         len(possible), round(pct, 1)))
    rows.sort(key=lambda r: r[3])
    print('\n== line coverage (sys.monitoring approximation) ==')
    for rel, h, a, pct in rows:
        print(f'{pct:6.1f}%  {h:5d}/{a:<5d}  {rel}')
    total = 100.0 * tot_hit / tot_all if tot_all else 100.0
    print(f'TOTAL {total:.1f}%  ({tot_hit}/{tot_all} lines)')
    print(json.dumps({'line_coverage_pct': round(total, 1),
                      'lines_hit': tot_hit, 'lines_total': tot_all}))
    return total


def main():
    _install()
    import pytest
    rc = pytest.main(sys.argv[1:] or ['tests/', '-q'])
    report()
    sys.exit(int(rc))


if __name__ == '__main__':
    main()
