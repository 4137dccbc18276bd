#!/usr/bin/env python
"""Aggregate an xprof trace.json.gz by HLO op category.

Usage: python tools/analyze_trace.py /tmp/trace_dir [top_n]

Finds the newest ``*.trace.json.gz`` under the dir, keeps device-track
complete events, and prints total device time by category (sort, gather,
dot/conv fusions, scatter, elementwise fusion, ...) plus the top-N
individual ops — the measurement tool behind PERF.md's stage tables.

Per-HLO ``bytes_accessed`` counters (attached by the TPU profiler to every
executed HLO event) additionally give a *measured* HBM roofline: each
executed HLO reads its operands from and writes its results to HBM (only
intra-fusion intermediates stay in VMEM), so summing bytes over one step
and dividing by the step's device time is the achieved HBM bandwidth —
the fusion-aware counterpart to ``cost_analysis()``'s op-level bound.
The report prints achieved GB/s per category and the time-weighted
fraction of the step running at >=60% of the chip's HBM peak.
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


V5E_HBM_BYTES_PER_S = 819e9  # one v5e chip


def hbm_report(events, peak=V5E_HBM_BYTES_PER_S):
    """Measured HBM roofline from per-HLO bytes_accessed counters.

    Returns (per-category dict, totals dict). Durations are trace 'dur'
    microseconds; bytes come from the profiler's per-event counter.
    """
    by_cat = collections.defaultdict(lambda: [0.0, 0.0])  # us, bytes
    n_steps = 0
    step_us = 0.0
    for e in events:
        name = e['name']
        if name.startswith('jit_') and '(' in name:
            n_steps += 1
            step_us += e['dur']
            continue
        args = e.get('args') or {}
        if 'bytes_accessed' not in args:
            continue
        cat = categorize(name)
        by_cat[cat][0] += e['dur']
        by_cat[cat][1] += float(args['bytes_accessed'])
    tot_us = sum(v[0] for v in by_cat.values())
    tot_bytes = sum(v[1] for v in by_cat.values())
    # time at >=60% of peak, over byte-counted events only
    fast_us = 0.0
    for e in events:
        args = e.get('args') or {}
        if 'bytes_accessed' not in args or not e['dur']:
            continue
        gbs = float(args['bytes_accessed']) / (e['dur'] * 1e-6)
        if gbs >= 0.6 * peak:
            fast_us += e['dur']
    totals = dict(n_steps=n_steps, step_us=step_us, hlo_us=tot_us,
                  bytes=tot_bytes, fast_us=fast_us)
    return by_cat, totals


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

    # source attribution: the profiler attaches the jax scope path (tf_op)
    # to every executed HLO — aggregate device time by leading scope
    # segments for the PERF.md stage ledger
    by_scope = collections.Counter()
    scope_bytes = collections.Counter()
    for e in events:
        args = e.get('args') or {}
        if 'bytes_accessed' not in args:
            continue
        segs = args.get('tf_op', '?').split('/')
        key = '/'.join(segs[2:5]) if len(segs) > 2 else args.get('tf_op', '?')
        by_scope[key] += e['dur']
        scope_bytes[key] += float(args['bytes_accessed'])
    if by_scope:
        print('\n# by jax scope (tf_op), top 20')
        print(f"{'scope':64s} {'ms':>9s} {'GB/s':>8s}")
        for k, us in by_scope.most_common(20):
            gbs = scope_bytes[k] / us * 1e-3 if us else 0
            print(f'{k[:64]:64s} {us/1e3:9.2f} {gbs:8.1f}')

    cat_bw, tot = hbm_report(events)
    if tot['bytes']:
        print('\n# measured HBM roofline (per-HLO bytes_accessed counters)')
        print(f"steps in window: {tot['n_steps']}, "
              f"device step time {tot['step_us']/1e3:.1f} ms total")
        denom_us = tot['step_us'] or tot['hlo_us']
        ach = tot['bytes'] / (denom_us * 1e-6)
        print(f"bytes moved: {tot['bytes']/1e9:.2f} GB over "
              f"{denom_us/1e3:.1f} ms -> achieved {ach/1e9:.1f} GB/s "
              f"({100*ach/V5E_HBM_BYTES_PER_S:.1f}% of v5e 819 GB/s peak)")
        print(f"time in HLOs running >=60% of peak: "
              f"{tot['fast_us']/1e3:.1f} ms "
              f"({100*tot['fast_us']/denom_us:.1f}% of step)")
        print(f"{'category':28s} {'ms':>9s} {'GB':>8s} {'GB/s':>8s} "
              f"{'%peak':>6s}")
        for cat, (us, b) in sorted(cat_bw.items(), key=lambda kv: -kv[1][0]):
            if not us:
                continue
            gbs = b / (us * 1e-6)
            print(f'{cat:28s} {us/1e3:9.2f} {b/1e9:8.2f} {gbs/1e9:8.1f} '
                  f'{100*gbs/V5E_HBM_BYTES_PER_S:6.1f}')


if __name__ == '__main__':
    main()
