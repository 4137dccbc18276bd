"""Batch loaders: synthetic fixture or on-disk EmbodiedScan data.

The loader is a plain-python iterable producing collated numpy batches with
static shapes; device transfer/sharding happens in the train loop. A
prefetching thread pool can be layered on later — the pipeline is pure numpy
and pickles cleanly.
"""

from typing import Dict, Iterator, List

import numpy as np

from ..configs.base import Config
from . import pipeline as pl


class SyntheticLoader:
    """Synthetic multi-view scans for smoke training and benchmarks."""

    def __init__(self, cfg: Config, train: bool, n_scans: int = 8):
        self.cfg = cfg
        self.train = train
        self.n_scans = n_scans
        d = cfg.data
        self.batch_size = d.batch_size if train else 1
        self.steps_per_epoch = max(1, n_scans // self.batch_size)
        from .synthetic import make_scan
        views = max(d.n_views_train, 4)
        self._scans = [
            make_scan(seed=i, n_views=views, hw=(64, 64), g=8,
                      num_classes=cfg.model.num_classes)
            for i in range(n_scans)
        ]

    def _sample(self, scan, seed):
        from .synthetic import scan_to_batch
        d = self.cfg.data
        sample = scan_to_batch(
            scan, n_views=d.n_views_train if self.train else
            min(d.n_views_test, len(scan['views'])),
            num_points=d.n_points, num_boxes=d.max_boxes, seed=seed,
            train=self.train, points_per_view=d.points_per_view)
        if self.cfg.model.task in ('cont_det3d', 'cont_occ'):
            # continuous pseudo-batch element: mask a random sweep prefix
            # of the views (construct_multi_sweeps semantics)
            rng = np.random.RandomState(seed + 1)
            v = sample['view_mask'].shape[0]
            keep = rng.randint(1, v + 1)
            vm = np.zeros(v, bool)
            vm[:keep] = True
            sample['view_mask'] = vm
        if self.cfg.model.task in ('mv_occ', 'cont_occ'):
            rng = np.random.RandomState(seed)
            m = 256
            nx, ny, nz = self.cfg.model.n_voxels
            occ = np.concatenate([
                rng.randint(0, nx, (m, 1)),
                rng.randint(0, ny, (m, 1)),
                rng.randint(0, nz, (m, 1)),
                rng.randint(1, self.cfg.model.occ_classes, (m, 1))
            ], -1).astype(np.float32)
            sample['gt_occ'] = occ
            sample['gt_occ_mask'] = np.ones(m, bool)
        if self.cfg.model.task == 'mv_grounding':
            from ..models.text import SimpleTokenizer, build_positive_maps
            tok = SimpleTokenizer(max_len=self.cfg.model.max_text_len)
            text = 'find the object near the wall'
            enc = tok([text])
            g = self.cfg.data.max_boxes
            maps = build_positive_maps(tok, [text], [[[[9, 15]]]],
                                       self.cfg.model.max_text_len, g)
            sample['text_ids'] = enc['input_ids'][0]
            sample['text_mask'] = enc['attention_mask'][0]
            sample['positive_maps'] = maps[0]
        return sample

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.RandomState(0 if not self.train else None)
        while True:
            idx = rng.randint(0, self.n_scans, self.batch_size)
            samples = [
                self._sample(self._scans[i], int(rng.randint(1 << 30)))
                for i in idx
            ]
            yield pl.collate(samples)
            if not self.train:
                # single pass over scans for eval
                self._eval_count = getattr(self, '_eval_count', 0) + 1
                if self._eval_count >= self.n_scans:
                    self._eval_count = 0
                    return


def build_loader(cfg: Config, train: bool):
    if cfg.data.synthetic:
        return SyntheticLoader(cfg, train)
    if cfg.model.task == 'mv_grounding' and cfg.data.vg_file:
        from .dataset import GroundingLoader
        return GroundingLoader(cfg, train)
    from .dataset import EmbodiedScanLoader
    return EmbodiedScanLoader(cfg, train)
