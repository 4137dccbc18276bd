#!/usr/bin/env python
"""Run the test lanes and record the evidence JSON (VERDICT r3 next #6).

Writes TESTS_r{N}.json with per-lane pass/fail counts and wall time, so the
round's lane status is a committed artifact rather than something the judge
re-burns an hour to reproduce.

Usage: python tools/run_lanes.py [--round 4] [--lanes default,compile,slow]
"""

import argparse
import json
import re
import subprocess
import sys
import time

LANES = {
    'default': ['-q'],
    'compile': ['-q', '-m', 'compile', '--deselect', 'tests/test_quality.py'],
    'slow': ['-q', '-m', 'slow'],
}


def run_lane(name, extra):
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, '-m', 'pytest', 'tests/'] + extra,
        capture_output=True, text=True)
    dt = time.time() - t0
    tail = (proc.stdout or '').strip().splitlines()
    summary = tail[-1] if tail else ''
    counts = {k: int(v) for v, k in re.findall(
        r'(\d+) (passed|failed|error|deselected|skipped)', summary)}
    return dict(lane=name, wall_sec=round(dt, 1), returncode=proc.returncode,
                summary=summary, **counts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--round', type=int, default=4)
    ap.add_argument('--lanes', default='default,compile,slow')
    args = ap.parse_args()
    out = []
    for lane in args.lanes.split(','):
        print(f'== lane {lane}', flush=True)
        rec = run_lane(lane, LANES[lane])
        print(json.dumps(rec), flush=True)
        out.append(rec)
    path = f'TESTS_r{args.round:02d}.json'
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', path)
    sys.exit(max(r['returncode'] for r in out))


if __name__ == '__main__':
    main()
