#!/usr/bin/env python
"""Aggregate an xprof trace.json.gz by HLO op category.

Usage: python tools/analyze_trace.py /tmp/trace_dir [top_n]

Finds the newest ``*.trace.json.gz`` under the dir, keeps device-track
complete events, and prints total device time by category (sort, gather,
dot/conv fusions, scatter, elementwise fusion, ...) plus the top-N
individual ops — the measurement tool behind PERF.md's stage tables.
"""

import collections
import glob
import gzip
import json
import os
import sys


def load_events(trace_dir):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, '**', '*trace.json.gz'), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise SystemExit(f'no trace.json.gz under {trace_dir}')
    with gzip.open(paths[-1], 'rt') as f:
        data = json.load(f)
    events = data['traceEvents']
    # device tracks: pid whose process_name mentions TPU/device; fall back
    # to "has XLA-looking op names"
    pid_names = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pid_names[e['pid']] = e['args'].get('name', '')
    device_pids = {p for p, n in pid_names.items()
                   if 'TPU' in n or 'device' in n.lower() or '/device' in n}
    out = []
    for e in events:
        if e.get('ph') != 'X' or 'dur' not in e:
            continue
        if device_pids and e.get('pid') not in device_pids:
            continue
        out.append(e)
    return out, pid_names


CATEGORIES = (
    ('sort', ('sort',)),
    ('gather', ('gather',)),
    ('scatter', ('scatter',)),
    ('matmul/conv', ('dot', 'conv', 'einsum')),
    ('cumsum/reduce-window', ('cum', 'reduce-window', 'reduce_window')),
    ('copy/transpose', ('copy', 'transpose')),
)


def categorize(name):
    low = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in low for k in keys):
            return cat
    if low.startswith('fusion') or '.fusion' in low:
        return 'fusion(elementwise/other)'
    return 'other'


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    events, pid_names = load_events(trace_dir)
    by_cat = collections.Counter()
    by_name = collections.Counter()
    for e in events:
        by_cat[categorize(e['name'])] += e['dur']
        by_name[e['name']] += e['dur']
    total = sum(by_cat.values())
    print(f'# device events: {len(events)}, total {total/1e3:.1f} ms '
          f'(all steps in window)')
    for cat, dur in by_cat.most_common():
        print(f'{cat:28s} {dur/1e3:9.2f} ms  {100*dur/total:5.1f}%')
    print('\n# top ops')
    for name, dur in by_name.most_common(top_n):
        print(f'{dur/1e3:9.2f} ms  {name[:110]}')


if __name__ == '__main__':
    main()
