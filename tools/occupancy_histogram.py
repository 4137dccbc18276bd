#!/usr/bin/env python
"""Measure per-level occupied-voxel counts vs configured capacities.

VERDICT r3 next #1c: capacity tuning must be driven by a COMMITTED
full-scale occupancy histogram per level, not guesses. This runs the
coordinate-only engine chain (voxelize -> stem s2 -> pool s4 -> stages
s8/s16/s32/s64) on the full-scale bench fixture (and on the synthetic
dataset batch) with generous capacities, reports true unique counts per
level, and suggests lane-aligned capacities at a given safety margin.

Usage:
    python tools/occupancy_histogram.py [--platform cpu] [--margin 1.25]
"""

import argparse
import sys

sys.path.insert(0, '.')


def chain_counts(points, mask, voxel_size, caps):
    """True occupied counts at stride 1/2/4/8/16/32/64 for one batch."""
    import jax
    import jax.numpy as jnp

    import embodiedscan_tpu.ops.sparse as S

    b, n = points.shape[:2]
    feats = jnp.ones((b, n, 1), jnp.float32)

    @jax.jit
    def run(points, feats, mask):
        counts = []
        st = S.from_points_b(points, feats, mask, voxel_size, caps[0])
        counts.append(st.mask.sum(-1))
        for cap in caps[1:]:
            dmap = S.downsample_coords_b(st, cap)
            st = S.SparseTensor(dmap.coords,
                                jnp.zeros(dmap.coords.shape[:2] + (1,),
                                          jnp.float32), dmap.mask)
            counts.append(st.mask.sum(-1))
        return counts

    return [int(c.max()) for c in run(points, feats, mask)]


def suggest(count, margin, lane=2048):
    """Round count*margin up to a lane multiple (>=1 lane)."""
    import math
    return max(lane, int(math.ceil(count * margin / lane)) * lane)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--platform', default='')
    ap.add_argument('--margin', type=float, default=1.25)
    args = ap.parse_args()
    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    import jax.numpy as jnp
    import numpy as np

    names = ['s1 (input)', 's2 (stem)', 's4 (pool)', 's8 (stage1/FPN0)',
             's16 (stage2/FPN1)', 's32 (stage3/FPN2)', 's64 (stage4/FPN3)']
    # generous measuring capacities (monotone halving floor)
    meas_caps = [262144, 131072, 65536, 65536, 32768, 16384, 8192]

    print('## bench fixture (full scale: 100k surface points, 0.01 m)')
    from bench import make_batch
    batch = make_batch(1, 100_000, 20, 480, 128, 284)
    counts = chain_counts(batch['points'], batch['points_mask'], 0.01,
                          meas_caps)
    from embodiedscan_tpu.configs.base import PRESETS
    cfg = PRESETS['mv_det3d']()
    cur = ([cfg.model.input_capacity] + list(cfg.model.backbone_capacities))
    print(f'{"level":20s} {"occupied":>9s} {"capacity":>9s} {"util":>6s} '
          f'{"suggest":>8s}')
    for nm, c, cap in zip(names, counts, cur):
        print(f'{nm:20s} {c:9d} {cap:9d} {c/cap:6.2f} '
              f'{suggest(c, args.margin):8d}')

    print('\n## synthetic dataset batch (data/synthetic.py, mv_det3d)')
    cfg.data.synthetic = True
    cfg.data.batch_size = 2
    from embodiedscan_tpu.data.loader import build_loader
    db = next(iter(build_loader(cfg, train=True)))
    counts2 = chain_counts(jnp.asarray(db['points']),
                           jnp.asarray(db['points_mask']),
                           cfg.model.voxel_size, meas_caps)
    for nm, c, cap in zip(names, counts2, cur):
        print(f'{nm:20s} {c:9d} {cap:9d} {c/cap:6.2f} '
              f'{suggest(c, args.margin):8d}')


if __name__ == '__main__':
    main()
