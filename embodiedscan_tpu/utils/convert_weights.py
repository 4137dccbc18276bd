"""PyTorch -> flax weight conversion for pretrained backbones.

The reference warm-starts from torchvision ResNet weights and HF RoBERTa
(configs/detection/mv-det3d...py:33, sparse_featfusion_grounder.py:107-109;
note the detection config's base_channels=16 makes most torchvision shapes
incompatible there — mmengine silently skips them, so parity does not depend
on the 2D weights). This module maps torch state_dicts onto this framework's
flax trees:

- conv kernels: OIHW -> HWIO transpose.
- BatchNorm: weight/bias -> scale/bias params; running stats -> batch_stats
  (our 2D backbone uses FrozenBatchNorm, matching norm_eval=True).
- ResNet block naming: torch ``layer{i}.{j}.conv{k}`` -> flax
  ``layer{i}_{j}/Conv_{k-1}``; downsample -> the trailing Conv/FrozenBatchNorm
  in the block.

Converting full reference EmbodiedScan checkpoints additionally needs the
MinkowskiEngine kernel-offset permutation (ME enumerates its hypercube kernel
in its own order vs. our x-major ``OFFSETS_3``); that mapping is exposed as a
parameter and left to calibration against a live ME install.
"""

from typing import Dict

import numpy as np


def _conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def convert_torchvision_resnet(state_dict: Dict[str, np.ndarray],
                               depth: int = 50):
    """torchvision ResNet state_dict -> (params, batch_stats) for our ResNet.

    Works for any base width; shapes must match the flax model being loaded
    into (use ``flax.core.unfreeze`` merge with the initialized tree).
    """
    n_blocks = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                101: (3, 4, 23, 3)}[depth]
    bottleneck = depth >= 50
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    put(params, ('stem_conv', 'kernel'), _conv(sd['conv1.weight']))
    put(params, ('stem_bn', 'scale'), sd['bn1.weight'])
    put(params, ('stem_bn', 'bias'), sd['bn1.bias'])
    put(stats, ('stem_bn', 'mean'), sd['bn1.running_mean'])
    put(stats, ('stem_bn', 'var'), sd['bn1.running_var'])

    n_convs = 3 if bottleneck else 2
    for i, blocks in enumerate(n_blocks):
        for j in range(blocks):
            src = f'layer{i + 1}.{j}'
            dst = f'layer{i + 1}_{j}'
            for k in range(n_convs):
                put(params, (dst, f'Conv_{k}', 'kernel'),
                    _conv(sd[f'{src}.conv{k + 1}.weight']))
                put(params, (dst, f'FrozenBatchNorm_{k}', 'scale'),
                    sd[f'{src}.bn{k + 1}.weight'])
                put(params, (dst, f'FrozenBatchNorm_{k}', 'bias'),
                    sd[f'{src}.bn{k + 1}.bias'])
                put(stats, (dst, f'FrozenBatchNorm_{k}', 'mean'),
                    sd[f'{src}.bn{k + 1}.running_mean'])
                put(stats, (dst, f'FrozenBatchNorm_{k}', 'var'),
                    sd[f'{src}.bn{k + 1}.running_var'])
            if f'{src}.downsample.0.weight' in sd:
                put(params, (dst, f'Conv_{n_convs}', 'kernel'),
                    _conv(sd[f'{src}.downsample.0.weight']))
                put(params, (dst, f'FrozenBatchNorm_{n_convs}', 'scale'),
                    sd[f'{src}.downsample.1.weight'])
                put(params, (dst, f'FrozenBatchNorm_{n_convs}', 'bias'),
                    sd[f'{src}.downsample.1.bias'])
                put(stats, (dst, f'FrozenBatchNorm_{n_convs}', 'mean'),
                    sd[f'{src}.downsample.1.running_mean'])
                put(stats, (dst, f'FrozenBatchNorm_{n_convs}', 'var'),
                    sd[f'{src}.downsample.1.running_var'])
    return params, stats


def load_resnet_into_variables(variables, torch_state_dict, depth=50,
                               prefix=('trunk', 'ResNet_0')):
    """Merge converted torchvision weights into initialized model variables.

    Shape-mismatched entries are skipped with a report (mmengine
    load_checkpoint behavior), so a 64-wide torchvision checkpoint against the
    16-wide detection backbone degrades exactly like the reference.
    """
    import flax
    params, stats = convert_torchvision_resnet(torch_state_dict, depth)
    var = flax.core.unfreeze(variables)
    skipped, loaded = [], 0

    def merge(dst, src, path):
        nonlocal loaded
        for k, v in src.items():
            if isinstance(v, dict):
                if k in dst:
                    merge(dst[k], v, path + (k,))
                else:
                    skipped.append('/'.join(path + (k,)))
            else:
                if k in dst and tuple(dst[k].shape) == tuple(v.shape):
                    dst[k] = v.astype(np.float32)
                    loaded += 1
                else:
                    skipped.append('/'.join(path + (k,)))

    node_p = var['params']
    node_s = var['batch_stats']
    for p in prefix:
        node_p = node_p.get(p, {})
        node_s = node_s.get(p, {})
    merge(node_p, params, prefix)
    merge(node_s, stats, prefix)
    return var, loaded, skipped


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state dict to numpy without CUDA."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt)
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, 'numpy')}
