#!/usr/bin/env python
"""Run bench.py across task families and record one committed artifact.

VERDICT r3 next #4: grounding + occupancy chip throughput must be recorded
numbers, not "unmeasured". Runs ``BENCH_TASK=<task> python bench.py`` for
each requested task (plus the flagship detector with no task set), collects
the one-line JSONs, and writes BENCH_tasks_r{N}.json.

Usage: python tools/bench_tasks.py [--round 4] [--tasks mv_grounding,mv_occ]
"""

import argparse
import json
import os
import subprocess
import sys
import time


def run_one(task):
    env = dict(os.environ)
    if task:
        env['BENCH_TASK'] = task
    else:
        env.pop('BENCH_TASK', None)
    t0 = time.time()
    proc = subprocess.run([sys.executable, 'bench.py'], env=env,
                          capture_output=True, text=True)
    dt = time.time() - t0
    line = (proc.stdout or '').strip().splitlines()
    rec = {}
    if line:
        try:
            rec = json.loads(line[-1])
        except ValueError:
            pass
    rec['task'] = task or 'mv_det3d (flagship)'
    rec['wall_sec'] = round(dt, 1)
    rec['returncode'] = proc.returncode
    if proc.returncode != 0:
        rec['stderr_tail'] = (proc.stderr or '')[-500:]
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--round', type=int, default=5)
    ap.add_argument('--tasks',
                    default='mv_grounding,mv_occ,cont_det3d,cont_occ')
    ap.add_argument('--include-flagship', action='store_true')
    args = ap.parse_args()
    out = []
    tasks = args.tasks.split(',') if args.tasks else []
    if args.include_flagship:
        tasks = [''] + tasks
    for task in tasks:
        print(f'== bench task {task or "flagship"}', flush=True)
        rec = run_one(task)
        print(json.dumps(rec), flush=True)
        out.append(rec)
    path = f'BENCH_tasks_r{args.round:02d}.json'
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
        f.write('\n')
    print(f'wrote {path}')


if __name__ == '__main__':
    main()
