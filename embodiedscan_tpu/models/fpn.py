"""2D FPN (mmdet.FPN equivalent) for the occupancy image branch.

The occupancy configs put an FPN on the image backbone
(configs/occupancy/mv-occ...py:33-36: in_channels [256..2048] -> 256, 4 outs)
and use only its finest level (dense_fusion_occ.py:148-152).
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    """Lateral 1x1 convs + top-down nearest upsampling + 3x3 output convs."""

    out_channels: int = 256
    num_outs: int = 4

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f'lateral{i}')(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(laterals[i], laterals[i - 1].shape,
                                  method='nearest')
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, name=f'fpn{i}')(x)
            for i, x in enumerate(laterals[:self.num_outs])
        ]
        return tuple(outs)
