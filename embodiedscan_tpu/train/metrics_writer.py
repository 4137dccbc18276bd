"""Scalar training-curve backends: JSONL always available, TensorBoard opt-in.

The reference wires visualization backends through mmengine's Visualizer
(``vis_backends=[dict(type='LocalVisBackend')]`` with a commented
``TensorboardVisBackend`` example, configs/grounding/mv-grounding_8xb12...
py:218-224, default_runtime.py:4-6); training curves are recovered from
log-line parsing unless TB is enabled. This module is the analog: every run
appends ``scalars.jsonl`` rows ``{"step": N, ...}`` under the work dir (the
always-on machine-readable story), and ``tensorboard`` in
``cfg.log_backends`` additionally streams the same scalars to TB event
files via torch's SummaryWriter when importable (torch is a baked-in test
dependency; missing TB degrades to a one-time warning, never an error).
"""

import json
import logging
import os
from typing import Mapping, Sequence

log = logging.getLogger('embodiedscan_tpu')


class MetricsWriter:
    """Fan-out scalar writer. Call :meth:`write` per logging step."""

    def __init__(self, log_dir: str,
                 backends: Sequence[str] = ('jsonl', )) -> None:
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        os.makedirs(log_dir, exist_ok=True)
        if 'jsonl' in backends:
            self._jsonl = open(os.path.join(log_dir, 'scalars.jsonl'), 'a')
        if 'tensorboard' in backends:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(log_dir, 'tb'))
            except Exception as e:  # noqa: BLE001 - TB is best-effort
                log.warning('tensorboard backend unavailable (%s); '
                            'scalars.jsonl still written', e)

    def write(self, step: int, scalars: Mapping[str, float],
              prefix: str = '') -> None:
        named = {(f'{prefix}/{k}' if prefix else k): float(v)
                 for k, v in scalars.items()}
        if self._jsonl is not None:
            self._jsonl.write(json.dumps({'step': int(step), **named}) + '\n')
            self._jsonl.flush()
        if self._tb is not None:
            for k, v in named.items():
                self._tb.add_scalar(k, v, int(step))

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
