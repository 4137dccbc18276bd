#!/usr/bin/env python
"""Overfit-quality harness: train tiny models on synthetic scenes, report.

Produces QUALITY.md with loss-collapse curves and memorization metrics for
the detection / grounding / occupancy stacks — the first learning evidence
for the full assign/decode/NMS/eval chains (tests/test_quality.py runs the
same checks as marked-slow regression tests).

Usage:
    python tools/quality_smoke.py [--steps N] [--out QUALITY.md]
"""

import argparse
import sys

sys.path.insert(0, '.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=100)
    ap.add_argument('--out', default='QUALITY.md')
    ap.add_argument('--platform', default='cpu')
    args = ap.parse_args()

    import os

    # one traced copy of the per-sample sort pipelines: ~b-times faster XLA
    # compile on a 1-core host; the sort-under-vmap TPU penalty does not
    # apply to the CPU backend this smoke targets
    if args.platform == 'cpu':
        os.environ.setdefault('EMBODIEDSCAN_BMAP', 'vmap')

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    # persistent compile cache shared with the test suite (conftest):
    # the overfit steps are compile-dominated on a single-core host
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import numpy as np

    sys.path.insert(0, 'tests')
    from test_quality import (grounding_overfit_metrics,
                              occupancy_overfit_metrics, overfit, tiny_cfg)

    lines = ['# QUALITY — synthetic overfit evidence', '',
             'Tiny models trained on ONE fixed synthetic batch; the loss '
             'must collapse and every task must recover the memorized '
             'targets through its full predict -> metric chain '
             '(det: NMS -> indoor_eval; grounding: top-10 -> ground_eval; '
             'occ: argmax -> occupancy_eval). VERDICT r1 item 3 / r2 next '
             '#3; the same checks run as tests/test_quality.py (-m slow).',
             '']

    cfg = tiny_cfg('mv_det3d')
    model, variables, batch, losses = overfit(cfg, steps=args.steps)
    preds = jax.device_get(
        jax.jit(lambda v, b: model.apply(v, b, train=False,
                                         mode='predict'))(variables, batch))
    from embodiedscan_tpu.eval.indoor_eval import indoor_eval
    gts, dts = [], []
    for i in range(batch['points'].shape[0]):
        keep = preds['mask'][i]
        dts.append(dict(bboxes=preds['bboxes'][i][keep],
                        scores=preds['scores'][i][keep],
                        labels=preds['labels'][i][keep]))
        gm = np.asarray(batch['gt_mask'][i])
        gts.append(dict(gt_boxes=np.asarray(batch['gt_boxes'][i])[gm],
                        gt_labels=np.asarray(batch['gt_labels'][i])[gm]))
    m = indoor_eval(gts, dts, (0.25, 0.5))
    lines += [f'## mv_det3d ({args.steps} steps)', '',
              f'- loss: {np.mean(losses[:5]):.3f} -> '
              f'{np.mean(losses[-5:]):.3f}',
              f'- overfit mAP@0.25: **{m["mAP_0.25"]:.3f}**  '
              f'mAP@0.5: {m.get("mAP_0.50", float("nan")):.3f}', '']
    print(lines[-3], lines[-2])

    # step counts mirror the slow-lane asserts (tests/test_quality.py:
    # det 100 / grounding 80 / occ 60 at the default --steps 100) so the
    # committed numbers are the same runs the tests gate on
    g_steps = max(1, args.steps * 8 // 10)
    gm_, losses = grounding_overfit_metrics(tiny_cfg('mv_grounding'),
                                            steps=g_steps)
    lines += [f'## mv_grounding ({g_steps} steps)', '',
              f'- loss: {np.mean(losses[:5]):.3f} -> '
              f'{np.mean(losses[-5:]):.3f}',
              f'- overfit grounding acc Overall@0.25: '
              f'**{gm_["Overall@0.25"]:.3f}**  '
              f'Overall@0.5: {gm_["Overall@0.5"]:.3f}', '']
    print(lines[-3], lines[-2])

    occ_steps = max(40, args.steps * 6 // 10)
    om, losses = occupancy_overfit_metrics(tiny_cfg('mv_occ'),
                                           steps=occ_steps)
    lines += [f'## mv_occ ({occ_steps} steps)', '',
              f'- loss: {np.mean(losses[:5]):.3f} -> '
              f'{np.mean(losses[-5:]):.3f}',
              f'- overfit geometry IoU: **{om["empty"]:.3f}**  '
              f'mIoU: {om["mIoU"]:.3f}', '']
    print(lines[-3], lines[-2])

    with open(args.out, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
