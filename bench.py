"""Benchmark: multi-view 3D detection train-step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The flagship workload mirrors the reference's mv-det config
(configs/detection/mv-det3d_8xb4...py): 100k aggregated points at 0.01 m
voxels, 20 views of 480x480 RGB, 284 classes, FCAF3DHeadRotMat losses,
AdamW train step. The reference publishes no throughput numbers
(SURVEY.md §6); BASELINE is a first-principles estimate of the PyTorch
stack on one A100 — see BASELINE.md "Throughput denominator" for the full
derivation (image-branch FLOPs, MinkowskiEngine cost range, per-sample
Python loops => 2-6 scenes/s; pinned at 2.5). Per-task denominators scale
the detection estimate by the per-GPU batch the reference's schedule was
tuned at (grounding 8xb12, occupancy 8xb1).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_SCENES_PER_SEC = 2.5  # est. A100 per-GPU mv-det3d (BASELINE.md)
TASK_BASELINE_SCENES_PER_SEC = {
    'mv_grounding': 7.5,   # 2.5 x (12/4): reference fit b=12/GPU (8xb12)
    'mv_occ': 0.625,       # 2.5 x (1/4):  reference fit b=1/GPU  (8xb1)
    'cont_det3d': 0.625,   # 8xb1 sweeps share the occ batch capacity
    'cont_occ': 0.625,
}


def make_batch(b, p, v, hw, g, num_classes, seed=0):
    rng = np.random.RandomState(seed)
    import jax.numpy as jnp
    # surface-like point cloud: points on room walls/floor, not uniform fill
    n_surf = p
    u = rng.uniform(0, 8, (n_surf, 2)).astype(np.float32)
    which = rng.randint(0, 3, n_surf)
    pts = np.zeros((n_surf, 3), np.float32)
    pts[which == 0] = np.stack([u[which == 0, 0], u[which == 0, 1],
                                np.zeros((which == 0).sum())], -1)  # floor
    pts[which == 1] = np.stack([u[which == 1, 0],
                                np.zeros((which == 1).sum()),
                                u[which == 1, 1] * 3 / 8], -1)  # wall y=0
    pts[which == 2] = np.stack([np.zeros((which == 2).sum()),
                                u[which == 2, 0],
                                u[which == 2, 1] * 3 / 8], -1)  # wall x=0
    pts = np.tile(pts[None], (b, 1, 1)) + rng.randn(b, n_surf, 3).astype(
        np.float32) * 0.01
    k = np.array([[500.0, 0, hw / 2, 0], [0, 500.0, hw / 2, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]], np.float32)
    exts = []
    for i in range(v):
        ext = np.eye(4, dtype=np.float32)
        ext[:3, 3] = [-4.0 + 0.1 * i, -4.0, 8.0]
        exts.append(k @ ext)
    proj = np.tile(np.stack(exts)[None], (b, 1, 1, 1))
    boxes = np.concatenate([
        rng.uniform(0.5, 7.5, (b, g, 2)),
        rng.uniform(0.2, 2.0, (b, g, 1)),
        rng.uniform(0.2, 1.5, (b, g, 3)),
        rng.uniform(-0.5, 0.5, (b, g, 3)),
    ], -1).astype(np.float32)
    return dict(
        points=jnp.asarray(pts),
        points_mask=jnp.ones((b, p), bool),
        imgs=jnp.asarray(rng.randn(b, v, hw, hw, 3).astype(np.float32)),
        proj=jnp.asarray(proj),
        aug_inv=jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))),
        gt_boxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(
            rng.randint(0, num_classes, (b, g)).astype(np.int32)),
        gt_mask=jnp.ones((b, g), bool),
    )


def _time_compiled_step(step, state, batch, b):
    """Shared timing loop: settle iterations + chained dispatch, one sync.

    Returns (scenes_per_sec, last_loss, seconds_per_step).
    """
    state, metrics = step(state, batch)  # warmup execution
    loss = float(metrics['loss_total'])  # full sync (value fetch)
    # settle: the remote runtime's FIRST execution of a fresh executable has
    # a large one-time cost that can bleed into the next few dispatches
    for _ in range(2):
        state, metrics = step(state, batch)
        loss = float(metrics['loss_total'])
    n_iter = int(os.environ.get('BENCH_ITERS', '10'))
    sync_every = int(os.environ.get('BENCH_SYNC_EVERY', str(n_iter)))
    trace_dir = os.environ.get('BENCH_TRACE')
    if trace_dir:
        import jax
        jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    for i in range(n_iter):
        state, metrics = step(state, batch)
        if (i + 1) % sync_every == 0 or i == n_iter - 1:
            loss = float(metrics['loss_total'])
    dt = (time.time() - t0) / n_iter
    if trace_dir:
        import jax
        jax.profiler.stop_trace()
    return b / dt, loss, dt


def _setup_jax():
    import jax
    # persistent compile cache: repeat bench/experiment runs skip the
    # minutes-long remote-tunnel compile of unchanged configurations
    jax.config.update(
        'jax_compilation_cache_dir',
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10.0)


def run_task(task: str):
    """Train-step throughput for the grounding / occupancy workloads.

    VERDICT r2 next #10: the perf story must cover all task families, not
    just the flagship detector. Uses the synthetic fixture at the reference
    workload scale (configs/grounding/mv-grounding_8xb12...py /
    configs/occupancy/mv-occ_8xb1...py shapes) with BENCH_B scenes per chip.
    """
    import jax
    import jax.numpy as jnp
    _setup_jax()
    from embodiedscan_tpu.configs.base import PRESETS, build_model
    from embodiedscan_tpu.data.loader import build_loader
    from embodiedscan_tpu.train.state import (create_train_state,
                                              make_optimizer, make_train_step,
                                              multistep_lr)
    cfg = PRESETS[task]()
    cfg.data.synthetic = True
    cfg.data.batch_size = int(os.environ.get('BENCH_B', '1'))
    cfg.data.prefetch_depth = 0
    n_sweeps = 0
    if task == 'cont_occ':
        # 10 reference sweeps need ~16.5 GB (0.78 GB/sweep of rematted-bf16
        # U-Net temps + 8.4 GB of AdamW state for the ~700M-param neck) —
        # the reference trained this config on 80 GB A100s. 7 sweeps is the
        # largest pseudo-batch one 15.75 GB v5e chip fits (8 misses by 133
        # MB); the metric is normalized to reference 10-sweep scans below.
        n_sweeps = int(os.environ.get('BENCH_CONT_SWEEPS', '7'))
        cfg.data.n_views_train = n_sweeps
    if task == 'mv_grounding':
        cfg.model.text_arch = 'tiny'  # offline image: no HF weights; the
        # tiny arch keeps the text trunk (embed+attn) without the download
        cfg.model.text_layers = 12
        cfg.model.text_hidden = 768
        cfg.model.text_heads = 12
        # remat trades FLOPs for memory; at the bench batch sizes the v5e
        # chip has headroom, so recompute is pure overhead (PERF.md ladder:
        # same call for detection at b=1)
        if cfg.data.batch_size <= 2:
            cfg.model.remat = 'none'
        # the axon TPU backend has no host-callback support, and the
        # on-device eps-optimal auction matcher is the designed TPU path
        # anyway (ops/hungarian.py); scipy callback stays the CPU/parity
        # default
        cfg.model.matcher = 'auction'
    if 'BENCH_BMAP' in os.environ:
        from embodiedscan_tpu.ops import sparse as _SS
        _SS.set_bmap_mode(os.environ['BENCH_BMAP'])
    batch = next(iter(build_loader(cfg, train=True)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = build_model(cfg)
    init = jax.jit(
        lambda rng, b: model.init(rng, b, train=False, mode='feats'))
    variables = init(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(multistep_lr(cfg.schedule.lr, 1000),
                        clip_norm=cfg.schedule.clip_norm)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
    compiled = step.lower(state, batch).compile()
    scenes_per_sec, loss, _ = _time_compiled_step(
        compiled, state, batch, cfg.data.batch_size)
    note = ''
    if task == 'cont_occ' and n_sweeps != 10:
        # normalize to reference 10-sweep scans
        scenes_per_sec *= n_sweeps / 10.0
        note = f', {n_sweeps}-sweep steps normalized to 10-sweep scans'
    return scenes_per_sec, loss, cfg.data.batch_size, note


def run(scale: str):
    import jax
    _setup_jax()
    from embodiedscan_tpu.models.detector import SparseFusionDetector
    from embodiedscan_tpu.train.state import (create_train_state,
                                              make_optimizer, make_train_step,
                                              multistep_lr)

    cfgs = {
        'full': dict(b=1, p=100_000, v=20, hw=480, g=128, classes=284,
                     input_capacity=98304,
                     backbone_capacities=(65536, 32768, 24576, 8192, 4096,
                                          2048),
                     fpn_capacities=(24576, 8192, 4096, 2048)),
        'small': dict(b=1, p=20_000, v=8, hw=256, g=64, classes=284,
                      input_capacity=32768,
                      backbone_capacities=(16384, 8192, 8192, 4096, 2048,
                                           1024),
                      fpn_capacities=(8192, 4096, 2048, 1024)),
    }
    cfg = cfgs[scale]
    # experiment knobs (default = shipping config)
    cfg['b'] = int(os.environ.get('BENCH_B', cfg['b']))
    if 'BENCH_BMAP' in os.environ:
        from embodiedscan_tpu.ops import sparse as _SS
        _SS.set_bmap_mode(os.environ['BENCH_BMAP'])
    # default mode is 'flat' (ops.sparse.BMAP_MODE): batch id in the sort
    # key, one flat sort over B*N rows — batch-size-independent HLO, so
    # b>1 neither recompiles per sample nor serializes (PERF.md r3)
    remat = {'0': False, '1': True}.get(os.environ.get('BENCH_REMAT', '0'),
                                        os.environ.get('BENCH_REMAT'))
    import jax.numpy as _jnp
    if os.environ.get('BENCH_SPARSE_BF16', '0') == '1':
        from embodiedscan_tpu.ops import sparse as _S
        _S.set_conv_compute_dtype(_jnp.bfloat16)
    # bf16 image branch is the shipping TPU config (+4.5% measured; geometry
    # and the sparse path stay f32) — BENCH_IMG_BF16=0 reverts
    img_dtype = _jnp.bfloat16 \
        if os.environ.get('BENCH_IMG_BF16', '1') == '1' else _jnp.float32
    model = SparseFusionDetector(
        num_classes=cfg['classes'],
        voxel_size=0.01,
        input_capacity=cfg['input_capacity'],
        backbone_capacities=cfg['backbone_capacities'],
        fpn_capacities=cfg['fpn_capacities'],
        remat=remat,
        img_dtype=img_dtype)
    batch = make_batch(cfg['b'], cfg['p'], cfg['v'], cfg['hw'], cfg['g'],
                       cfg['classes'])
    # jit the init: eager init dispatches thousands of individual ops,
    # each compiled separately (minutes over the TPU tunnel)
    init = jax.jit(
        lambda rng, b: model.init(rng, b, train=False, mode='feats'))
    variables = init(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(multistep_lr(1e-3, 1000), clip_norm=10.0)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    # lower+compile explicitly so the executable's own FLOP count is
    # available for MFU (cost_analysis counts matmul/conv FLOPs; gathers
    # count ~0, matching the "conv cost = gather cost" PERF.md model)
    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        step_flops = float(ca.get('flops', 0.0))
        step_bytes = float(ca.get('bytes accessed', 0.0))
    except Exception:  # noqa: BLE001 - cost analysis is best-effort
        step_flops = 0.0
        step_bytes = 0.0

    # sync cadence: each step consumes the previous step's state, so ONE
    # value fetch at the end of the chain is a full-pipeline sync (value
    # fetches are the honest sync point under the remote runtime — plain
    # block_until_ready has been observed not to account the full chain).
    # Chained dispatch is the steady-state training profile; per-step
    # fetches (BENCH_SYNC_EVERY=1) add the ~25 ms RPC round trip to every
    # iteration and measure dispatch latency, not throughput.
    scenes_per_sec, loss, dt = _time_compiled_step(compiled, state, batch,
                                                   cfg['b'])
    # MFU vs the v5e bf16 peak (197 TFLOP/s). The image branch runs bf16,
    # the sparse branch f32; XLA's flops estimate is dtype-agnostic, so
    # this is a *lower bound* on utilization vs the mixed-precision peak.
    V5E_PEAK_FLOPS = 197e12
    mfu = (step_flops / dt) / V5E_PEAK_FLOPS if step_flops else None
    # Gather-aware roofline companion to MFU (VERDICT r2 weak #1): this
    # workload is HBM-bound (sorts + gathers move bytes, not FLOPs), so the
    # capacity question is bytes vs HBM peak (v5e: 819 GB/s), not FLOPs vs
    # MXU peak. cost_analysis's 'bytes accessed' is the op-level operand+
    # output byte count of the compiled HLO — fusion-blind, so bytes XLA
    # actually keeps in VMEM/registers are still counted. Measured value at
    # full scale is ~1.4: the op-level byte stream EXCEEDS what HBM could
    # move in the measured step time, i.e. even if only ~70% of counted
    # bytes touch HBM the step is running AT the memory roofline. Values
    # near or above 1.0 mean no headroom is provable from byte counting;
    # values well below 1.0 would indicate idle bandwidth worth chasing.
    V5E_HBM_BYTES_PER_S = 819e9
    hbm_util = ((step_bytes / dt) / V5E_HBM_BYTES_PER_S
                if step_bytes else None)
    return scenes_per_sec, loss, mfu, hbm_util, cfg['b']


def main():
    task = os.environ.get('BENCH_TASK', '')
    if task:
        scenes_per_sec, _, b, note = run_task(task)
        denom = TASK_BASELINE_SCENES_PER_SEC.get(task,
                                                 BASELINE_SCENES_PER_SEC)
        print(json.dumps({
            'metric': f'{task} train scenes/sec/chip (b={b}{note})',
            'value': round(scenes_per_sec, 4),
            'unit': 'scenes/sec',
            'vs_baseline': round(scenes_per_sec / denom, 3),
        }))
        return
    for scale in (os.environ.get('BENCH_SCALE', 'full'), 'small'):
        try:
            scenes_per_sec, loss, mfu, hbm_util, b = run(scale)
            print(json.dumps({
                'metric': f'mv-det3d train scenes/sec/chip ({scale}, b={b})',
                'value': round(scenes_per_sec, 4),
                'unit': 'scenes/sec',
                'vs_baseline': round(scenes_per_sec / BASELINE_SCENES_PER_SEC,
                                     3),
                'mfu_vs_bf16_peak': round(mfu, 4) if mfu is not None else None,
                'bytes_accessed_over_hbm_roofline': round(hbm_util, 4)
                if hbm_util is not None else None,
            }))
            return
        except Exception as e:  # noqa: BLE001 - fall back to smaller scale
            print(f'bench scale={scale} failed: {type(e).__name__}: {e}',
                  file=sys.stderr)
    print(json.dumps({
        'metric': 'mv-det3d train scenes/sec/chip',
        'value': 0.0,
        'unit': 'scenes/sec',
        'vs_baseline': 0.0,
    }))


if __name__ == '__main__':
    main()
