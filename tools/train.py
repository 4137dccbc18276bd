#!/usr/bin/env python
"""Train CLI (reference tools/train.py semantics, dataclass configs).

Usage:
    python tools/train.py mv_det3d [key.subkey=value ...] \
        [--work-dir DIR] [--resume auto] [--max-steps N] [--synthetic]
"""

import argparse
import sys

sys.path.insert(0, '.')


def main():
    parser = argparse.ArgumentParser(description='Train an EmbodiedScan-TPU model')
    parser.add_argument('config', help='preset name: ' +
                        'mv_det3d|cont_det3d|mv_grounding|mv_occ|cont_occ')
    parser.add_argument('overrides', nargs='*',
                        help='dot-path config overrides, e.g. data.batch_size=2')
    parser.add_argument('--work-dir', default=None)
    parser.add_argument('--resume', default='', help="'' | 'auto'")
    parser.add_argument('--max-steps', type=int, default=None,
                        help='cap total steps (smoke runs)')
    parser.add_argument('--platform', default='',
                        help='force jax platform (cpu|tpu); the container '
                             'pins the TPU plugin via sitecustomize, so env '
                             'vars alone cannot switch to CPU')
    parser.add_argument('--synthetic', action='store_true',
                        help='use the synthetic fixture dataset')
    parser.add_argument('--auto-scale-lr', action='store_true',
                        help='linearly scale lr by global_batch / '
                             'schedule.base_batch_size (the reference '
                             'tools/train.py:98-109 / mmengine '
                             'auto_scale_lr rule)')
    parser.add_argument('--multihost', action='store_true',
                        help='initialize jax.distributed (one process per '
                             'host; slurm/GKE/TPU-pod auto-detected) — the '
                             'reference --launcher slurm/mpi analog')
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)
    if args.multihost:
        from embodiedscan_tpu.parallel.multihost import init_distributed
        active = init_distributed()
        import jax
        print(f'multihost: active={active} process '
              f'{jax.process_index()}/{jax.process_count()}, '
              f'{jax.local_device_count()} local devices')

    from embodiedscan_tpu.configs.base import PRESETS, apply_overrides
    cfg = PRESETS[args.config]()
    apply_overrides(cfg, args.overrides)
    if args.work_dir:
        cfg.work_dir = args.work_dir
    if args.resume:
        cfg.resume = args.resume
    if args.synthetic:
        cfg.data.synthetic = True
    if args.auto_scale_lr:
        import jax
        global_batch = cfg.data.batch_size * (
            jax.process_count() if args.multihost else 1)
        scale = global_batch / cfg.schedule.base_batch_size
        cfg.schedule.lr = cfg.schedule.lr * scale
        print(f'auto-scale-lr: global_batch={global_batch} '
              f'base={cfg.schedule.base_batch_size} -> lr={cfg.schedule.lr}')

    from embodiedscan_tpu.train.loop import train
    train(cfg, max_steps=args.max_steps)


if __name__ == '__main__':
    main()
