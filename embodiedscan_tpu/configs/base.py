"""Typed dataclass configs with dot-override CLI semantics.

Replaces the reference's mmengine python-file configs + ``--cfg-options``
deep-merge (tools/train.py:37-45, SURVEY.md §5.6) with plain dataclasses: the
nine reference configs map 1:1 onto the presets in this package, and
``key.subkey=value`` CLI overrides work the same way.
"""

import dataclasses
from typing import Any, Sequence


def _convert(value: str, current: Any):
    if isinstance(current, bool):
        return value.lower() in ('1', 'true', 'yes')
    if isinstance(current, int):
        return int(value)
    if isinstance(current, float):
        return float(value)
    if isinstance(current, (tuple, list)):
        parts = [p for p in value.strip('[]()').split(',') if p]
        elem = current[0] if len(current) else 0
        return type(current)(_convert(p, elem) for p in parts)
    return value


def apply_overrides(cfg: Any, overrides: Sequence[str]):
    """Apply ``a.b=c`` style overrides to a (nested) dataclass in place."""
    for item in overrides:
        key, _, value = item.partition('=')
        parts = key.split('.')
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        current = getattr(obj, parts[-1])
        object.__setattr__(obj, parts[-1], _convert(value, current))
    return cfg


@dataclasses.dataclass
class ScheduleConfig:
    """Optimizer + LR schedule (configs/detection/mv-det3d...py:215-231)."""
    max_epochs: int = 12
    lr: float = 1e-3
    weight_decay: float = 1e-4
    clip_norm: float = 10.0
    milestones: Sequence[int] = (8, 11)
    gamma: float = 0.1
    val_interval: int = 1
    # reference global batch the preset's lr was tuned at (8 GPUs x per-GPU
    # batch from the 8xbN config name) — the --auto-scale-lr denominator
    # (reference tools/train.py:98-109 / mmengine auto_scale_lr)
    base_batch_size: int = 32


@dataclasses.dataclass
class DataConfig:
    data_root: str = 'data'
    ann_file: str = 'embodiedscan_infos_train.pkl'
    val_ann_file: str = 'embodiedscan_infos_val.pkl'
    vg_file: str = ''
    batch_size: int = 4
    n_views_train: int = 20
    n_views_test: int = 50
    n_points: int = 100000
    points_per_view: int = 10000
    image_hw: Sequence[int] = (480, 480)
    max_boxes: int = 200
    max_occ_voxels: int = 16384
    repeat_times: int = 1
    synthetic: bool = False  # use the synthetic fixture instead of disk data
    # local dir with RoBERTa vocab files (vocab.json/merges.txt); '' = the
    # offline hash tokenizer (reference: RobertaTokenizerFast, grounder:108)
    tokenizer_path: str = ''
    # host data pipeline backend: 'auto' uses the threaded C++ core
    # (embodiedscan_tpu/native) when it builds/loads on this host, 'numpy'
    # forces the pure-python path. Synthetic fixtures always use numpy so
    # test batches are bit-stable across hosts.
    native_pipeline: str = 'auto'
    # host/device overlap (reference num_workers=4, persistent_workers=True,
    # mv-det3d...py:182-183): num_workers threads build the samples of one
    # batch concurrently; prefetch_depth batches are staged ahead of the
    # device step by a producer thread (0 disables prefetch).
    num_workers: int = 4
    prefetch_depth: int = 2


@dataclasses.dataclass
class ModelConfig:
    task: str = 'mv_det3d'  # mv_det3d | cont_det3d | mv_grounding |
    # mv_occ | cont_occ
    num_classes: int = 284
    voxel_size: float = 0.01
    input_capacity: int = 98304
    backbone_capacities: Sequence[int] = (65536, 32768, 24576, 8192, 4096,
                                          2048)
    fpn_capacities: Sequence[int] = (24576, 8192, 4096, 2048)
    resnet_depth: int = 50
    mink_depth: int = 34
    # test cfg (configs/detection/mv-det3d...py:58)
    nms_pre: int = 1000
    max_candidates: int = 1024
    max_dets: int = 256
    # 'reference' = yaw-truncated detection predictions exactly like the
    # published protocol (fcaf3d_head.py:1681-1683); 'full9d' keeps the
    # predicted pitch/roll (our extension, NOT the published protocol)
    predict_protocol: str = 'reference'
    # grounding
    num_queries: int = 256
    max_text_len: int = 256
    text_arch: str = 'roberta'  # 'roberta' | 'tiny' (tests/smoke)
    text_layers: int = 12
    text_hidden: int = 768
    text_heads: int = 12
    # rematerialization: 'none' | '2d' | '3d' | 'all'. '2d' measured best
    # for batch >= 2 at full scale on v5e (PERF.md batch-scaling ladder)
    remat: str = '2d'
    # Hungarian matcher (grounding): 'hungarian' (scipy callback, reference
    # parity) | 'auction' (on-device)
    matcher: str = 'hungarian'
    # grounding box coder: 'baseline' | 'FCAF' (grounding_head.py:279-362)
    box_coder: str = 'baseline'
    # freeze the text trunk (reference lr_mult=0, mv-grounding...py:199)
    freeze_text: bool = True
    # occupancy
    occ_classes: int = 81
    n_voxels: Sequence[int] = (40, 40, 16)
    # PointsRangeFilter bound + sparse-branch origin (mv-occ...py:6)
    point_cloud_range: Sequence[float] = (-3.2, -3.2, -0.78, 3.2, 3.2, 1.78)
    occ_fpn_channels: int = 256
    occ_pre_neck_channels: int = 0
    # bf16 3D U-Net compute (activation memory; cont_occ needs it to fit)
    occ_neck_bf16: bool = False
    resnet_base_channels: int = 64


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    schedule: ScheduleConfig = dataclasses.field(
        default_factory=ScheduleConfig)
    work_dir: str = 'work_dirs/default'
    seed: int = 0
    log_interval: int = 50
    # scalar-curve backends (reference vis_backends, default_runtime.py:4-6
    # + the commented TensorboardVisBackend example in mv-grounding...py:
    # 218-224): 'jsonl' appends work_dir/scalars.jsonl; add 'tensorboard'
    # (log_backends=jsonl,tensorboard) for TB event files in work_dir/tb
    log_backends: Sequence[str] = ('jsonl', )
    resume: str = ''  # '', 'auto', or a checkpoint step
    n_devices: int = 0  # 0 = all
    profile_dir: str = ''  # if set, capture a jax.profiler trace of steps 5-10
    # in-loop visualization hook (reference EmbodiedScanBaseVisualizer /
    # Det3DVisualizationHook wiring, base_visualizer.py:71-132): when set,
    # evaluate() exports scene PLYs with predicted boxes every vis_interval
    # scenes into vis_dir
    vis_dir: str = ''
    vis_interval: int = 50
    vis_score_thr: float = 0.15


def mv_det3d() -> Config:
    """configs/detection/mv-det3d_8xb4_embodiedscan-3d-284class-9dof.py."""
    cfg = Config()
    cfg.work_dir = 'work_dirs/mv_det3d'
    cfg.data.repeat_times = 10
    return cfg


def cont_det3d() -> Config:
    """configs/detection/cont-det3d_8xb1_embodiedscan-3d-284class-9dof.py."""
    cfg = Config()
    cfg.model.task = 'cont_det3d'
    cfg.data.batch_size = 1
    # 10 train sweeps (cont-det3d...py:138 n_images=10)
    cfg.data.n_views_train = 10
    cfg.schedule.base_batch_size = 8  # 8xb1
    cfg.work_dir = 'work_dirs/cont_det3d'
    return cfg


def mv_grounding() -> Config:
    """configs/grounding/mv-grounding_8xb12_embodiedscan-vg-9dof.py."""
    cfg = Config()
    cfg.model.task = 'mv_grounding'
    cfg.model.fpn_capacities = (1024, 1024, 1024, 2048)
    cfg.data.batch_size = 12
    # VG prompts target a handful of instances (the reference pads ragged
    # per-batch, mv_3dvg_dataset.py joins one prompt's targets); 64 bounds
    # every published prompt family while keeping the Q x G match-cost /
    # auction tensors 3x smaller than the detection cap of 200
    cfg.data.max_boxes = 64
    cfg.data.vg_file = 'embodiedscan_train_vg.json'
    cfg.schedule.lr = 5e-4
    cfg.schedule.weight_decay = 5e-4
    cfg.schedule.base_batch_size = 96  # 8xb12
    cfg.work_dir = 'work_dirs/mv_grounding'
    return cfg


def mv_occ() -> Config:
    """configs/occupancy/mv-occ_8xb1_embodiedscan-occ-80class.py."""
    cfg = Config()
    cfg.model.task = 'mv_occ'
    cfg.data.batch_size = 1
    cfg.data.n_views_train = 10
    cfg.data.n_views_test = 20
    cfg.schedule.max_epochs = 24
    cfg.schedule.milestones = (16, 22)
    cfg.schedule.base_batch_size = 8  # 8xb1
    cfg.work_dir = 'work_dirs/mv_occ'
    return cfg


def cont_occ() -> Config:
    """configs/occupancy/cont-occ_8xb1_embodiedscan-occ-80class.py."""
    cfg = mv_occ()
    cfg.model.task = 'cont_occ'
    # the 10-sweep pseudo-batch multiplies sparse-branch activations by 10;
    # remat the 3D stages so one scan fits a 16 GB chip (the 2D branch is
    # per-scan, not per-sweep, and stays un-rematerialized)
    cfg.model.remat = 'all'
    cfg.model.occ_neck_bf16 = True
    cfg.work_dir = 'work_dirs/cont_occ'
    return cfg


def mv_grounding_mini() -> Config:
    """configs/grounding/mv-grounding_8xb12_embodiedscan-vg-9dof-mini.py:
    the 20%-data warmup variant (README.md:218)."""
    cfg = mv_grounding()
    cfg.data.vg_file = 'embodiedscan_train_mini_vg.json'
    cfg.work_dir = 'work_dirs/mv_grounding_mini'
    return cfg


def mv_grounding_complex() -> Config:
    """mv-grounding ... complex-all variant: adds complex prompts
    (README.md:229-230)."""
    cfg = mv_grounding()
    cfg.data.vg_file = 'embodiedscan_train_vg_complex_all.json'
    cfg.work_dir = 'work_dirs/mv_grounding_complex'
    return cfg


PRESETS = {
    'mv_det3d': mv_det3d,
    'cont_det3d': cont_det3d,
    'mv_grounding': mv_grounding,
    'mv_grounding_mini': mv_grounding_mini,
    'mv_grounding_complex': mv_grounding_complex,
    'mv_occ': mv_occ,
    'cont_occ': cont_occ,
}


def build_model(cfg: Config):
    """Instantiate the flax model for a config."""
    m = cfg.model
    if m.task in ('mv_det3d', 'cont_det3d'):
        from ..models.detector import SparseFusionDetector
        return SparseFusionDetector(
            num_classes=m.num_classes,
            voxel_size=m.voxel_size,
            input_capacity=m.input_capacity,
            backbone_capacities=tuple(m.backbone_capacities),
            fpn_capacities=tuple(m.fpn_capacities),
            resnet_depth=m.resnet_depth,
            mink_depth=m.mink_depth,
            nms_pre=m.nms_pre,
            max_candidates=m.max_candidates,
            max_dets=m.max_dets,
            predict_protocol=m.predict_protocol,
            remat=m.remat)
    if m.task == 'mv_grounding':
        from ..models.grounding import SparseFusionGrounder
        return SparseFusionGrounder(
            num_queries=m.num_queries,
            voxel_size=m.voxel_size,
            max_text_len=m.max_text_len,
            input_capacity=m.input_capacity,
            backbone_capacities=tuple(m.backbone_capacities),
            fpn_capacities=tuple(m.fpn_capacities),
            resnet_depth=m.resnet_depth,
            mink_depth=m.mink_depth,
            text_arch=m.text_arch,
            text_layers=m.text_layers,
            text_hidden=m.text_hidden,
            text_heads=m.text_heads,
            freeze_text=m.freeze_text,
            matcher=m.matcher,
            box_coder=m.box_coder,
            remat=m.remat)
    if m.task in ('mv_occ', 'cont_occ'):
        import jax.numpy as jnp

        from ..models.occupancy import DenseFusionOccPredictor
        return DenseFusionOccPredictor(
            num_classes=m.occ_classes,
            n_voxels=tuple(m.n_voxels),
            point_cloud_range=tuple(m.point_cloud_range),
            input_capacity=m.input_capacity,
            backbone_capacities=tuple(m.backbone_capacities),
            resnet_depth=m.resnet_depth,
            resnet_base_channels=m.resnet_base_channels,
            mink_depth=m.mink_depth,
            fpn_channels=m.occ_fpn_channels,
            pre_neck_channels=m.occ_pre_neck_channels,
            neck_dtype=jnp.bfloat16 if m.occ_neck_bf16 else jnp.float32,
            remat=m.remat if m.task == 'cont_occ' else 'none')
    raise ValueError(m.task)
