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

Converting full reference EmbodiedScan checkpoints additionally applies the
MinkowskiEngine kernel-offset permutation (``me_kernel_permutation``): ME's
region iterator enumerates the hypercube odometer-style with the FIRST
spatial axis varying fastest (z-major rows), while our ``OFFSETS_3`` varies z
fastest. The mapping is derived analytically from ME's documented
enumeration and pinned by ``tests/test_me_permutation.py``, which checks
conv-output equivalence (submanifold k3, strided k3 s2, generative
transposed k2 s2) against an independently-encoded ME-semantics oracle — no
live ME install needed.
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


# ---------------------------------------------------------------------------
# Reference EmbodiedScan checkpoint conversion: MinkowskiEngine backbone
# ---------------------------------------------------------------------------

def me_kernel_permutation(kernel_size: int = 3, flip: bool = False):
    """Permutation mapping ME kernel rows onto our offset order.

    MinkowskiEngine enumerates its hypercube kernel region odometer-style
    with dimension 0 varying fastest (offsets -(k//2)..k//2 per axis for odd
    k, 0..k-1 for the generative transposed conv's even k), while this
    framework's ``OFFSETS_3``/``OFFSETS_2`` vary z fastest (ops/sparse.py:31).
    Returns ``perm`` such that ``ours[i] = me[perm[i]]``. Pinned offline by
    ``tests/test_me_permutation.py`` (conv-output equivalence against an
    independently-encoded ME-semantics oracle for all three kernel shapes).

    Args:
        kernel_size: 3 (27-point conv), 2 (8-point transposed), or 1.
        flip: negate offsets (for conventions that gather at ``u - off``).
    """
    if kernel_size == 1:
        return np.array([0])
    if kernel_size == 3:
        rng = (-1, 0, 1)
        ours = [(dx, dy, dz) for dx in rng for dy in rng for dz in rng]
        me = [(dx, dy, dz) for dz in rng for dy in rng for dx in rng]
    elif kernel_size == 2:
        rng = (0, 1)
        ours = [(dx, dy, dz) for dx in rng for dy in rng for dz in rng]
        me = [(dx, dy, dz) for dz in rng for dy in rng for dx in rng]
    else:
        raise ValueError(f'unsupported kernel_size {kernel_size}')
    if flip:
        lo, hi = min(rng), max(rng)
        me = [tuple(lo + hi - o for o in off) for off in me]
    index = {off: i for i, off in enumerate(me)}
    return np.array([index[off] for off in ours])


def _me_kernel(w, flip=False):
    """ME conv kernel (K, Cin, Cout) -> our row order.

    ME stores kernel-volume-1 convolutions as plain (Cin, Cout) matrices;
    those map to our (1, Cin, Cout) layout unpermuted.
    """
    w = np.asarray(w)
    if w.ndim == 2:
        return w[None]
    k = {27: 3, 8: 2, 1: 1}[w.shape[0]]
    return w[me_kernel_permutation(k, flip)]


def _me_pointwise(w):
    """ME 1x1 kernel -> (Cin, Cout) dense matrix for our pointwise Dense."""
    w = np.asarray(w)
    return w[0] if w.ndim == 3 else w


def convert_mink_resnet(state_dict: Dict[str, np.ndarray], depth: int = 34,
                        prefix: str = 'backbone_3d.', flip: bool = False):
    """Reference MinkResNet weights -> (params, batch_stats) flax trees.

    Maps ME module names (``mink_resnet.py:58-74``: conv1/norm1 stem,
    ``layer{i}.{j}.conv{1,2}[,3]``/``norm{1,2}[,3]``/``downsample``) onto our
    ``MinkResNet`` tree (stem ``SparseConv_0``/``MaskedInstanceNorm_0``,
    stages ``SparseStage_{i}`` with ``SparseConv_{0,1,2}``/
    ``MaskedBatchNorm_{0,1,2}`` for the strided block and
    ``SparseBasicBlock_{j}``/``SparseBottleneck_{j}`` for the rest), applying
    the ME kernel-offset permutation to every (K, Cin, Cout) kernel.

    BatchNorm keys accept both ``norm.bn.*`` (MinkowskiBatchNorm wraps
    nn.BatchNorm1d) and plain ``norm.*`` layouts.
    """
    n_blocks = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[depth]
    bottleneck = depth >= 50
    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def bn_get(name, field):
        for key in (f'{name}.bn.{field}', f'{name}.{field}'):
            if key in sd:
                return sd[key]
        raise KeyError(f'{prefix}{name}.{field} not in state dict')

    def put_bn(dst_path, src_name):
        put(params, dst_path + ('scale',), bn_get(src_name, 'weight'))
        put(params, dst_path + ('bias',), bn_get(src_name, 'bias'))
        put(stats, dst_path + ('mean',), bn_get(src_name, 'running_mean'))
        put(stats, dst_path + ('var',), bn_get(src_name, 'running_var'))

    # stem: ME conv1 + MinkowskiInstanceNorm norm1
    put(params, ('SparseConv_0', 'kernel'), _me_kernel(sd['conv1.kernel'],
                                                       flip))
    for key in ('norm1.inst_norm.weight', 'norm1.weight'):
        if key in sd:
            put(params, ('MaskedInstanceNorm_0', 'scale'), sd[key])
            put(params, ('MaskedInstanceNorm_0', 'bias'),
                sd[key.replace('weight', 'bias')])
            break

    for i, blocks in enumerate(n_blocks):
        stage = f'SparseStage_{i}'
        src0 = f'layer{i + 1}.0'
        if bottleneck:
            # b0_conv1 (1x1 Dense), strided conv2, b0_conv3 (1x1 Dense)
            put(params, (stage, 'b0_conv1', 'kernel'),
                _me_pointwise(sd[f'{src0}.conv1.kernel']))
            put_bn((stage, 'MaskedBatchNorm_0'), f'{src0}.norm1')
            put(params, (stage, 'SparseConv_0', 'kernel'),
                _me_kernel(sd[f'{src0}.conv2.kernel'], flip))
            put_bn((stage, 'MaskedBatchNorm_1'), f'{src0}.norm2')
            put(params, (stage, 'b0_conv3', 'kernel'),
                _me_pointwise(sd[f'{src0}.conv3.kernel']))
            put_bn((stage, 'MaskedBatchNorm_2'), f'{src0}.norm3')
            put(params, (stage, 'SparseConv_1', 'kernel'),
                _me_kernel(sd[f'{src0}.downsample.0.kernel'], flip))
            put_bn((stage, 'MaskedBatchNorm_3'), f'{src0}.downsample.1')
        else:
            put(params, (stage, 'SparseConv_0', 'kernel'),
                _me_kernel(sd[f'{src0}.conv1.kernel'], flip))
            put_bn((stage, 'MaskedBatchNorm_0'), f'{src0}.norm1')
            put(params, (stage, 'SparseConv_1', 'kernel'),
                _me_kernel(sd[f'{src0}.conv2.kernel'], flip))
            put_bn((stage, 'MaskedBatchNorm_1'), f'{src0}.norm2')
            put(params, (stage, 'SparseConv_2', 'kernel'),
                _me_kernel(sd[f'{src0}.downsample.0.kernel'], flip))
            put_bn((stage, 'MaskedBatchNorm_2'), f'{src0}.downsample.1')
        block_name = 'SparseBottleneck' if bottleneck else 'SparseBasicBlock'
        for j in range(1, blocks):
            src = f'layer{i + 1}.{j}'
            dst = (stage, f'{block_name}_{j - 1}')
            if bottleneck:
                put(params, dst + ('conv1', 'kernel'),
                    _me_pointwise(sd[f'{src}.conv1.kernel']))
                put_bn(dst + ('MaskedBatchNorm_0',), f'{src}.norm1')
                put(params, dst + ('SparseConv_0', 'kernel'),
                    _me_kernel(sd[f'{src}.conv2.kernel'], flip))
                put_bn(dst + ('MaskedBatchNorm_1',), f'{src}.norm2')
                put(params, dst + ('conv3', 'kernel'),
                    _me_pointwise(sd[f'{src}.conv3.kernel']))
                put_bn(dst + ('MaskedBatchNorm_2',), f'{src}.norm3')
            else:
                put(params, dst + ('SparseConv_0', 'kernel'),
                    _me_kernel(sd[f'{src}.conv1.kernel'], flip))
                put_bn(dst + ('MaskedBatchNorm_0',), f'{src}.norm1')
                put(params, dst + ('SparseConv_1', 'kernel'),
                    _me_kernel(sd[f'{src}.conv2.kernel'], flip))
                put_bn(dst + ('MaskedBatchNorm_1',), f'{src}.norm2')
    return params, stats


def _merge_into(variables, params, stats, prefix):
    """Merge (params, stats) trees into ``variables`` under ``prefix``.

    Shape-mismatched/missing entries are skipped with a report — the
    mmengine ``load_checkpoint(strict=False)`` behavior the reference
    relies on. Returns (variables, n_loaded, skipped_paths).
    """
    import flax
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
    node_s = var.get('batch_stats', {})
    for p in prefix:
        node_p = node_p.get(p, {})
        node_s = node_s.get(p, {}) if node_s else {}
    merge(node_p, params, prefix)
    if stats:
        merge(node_s, stats, prefix)
    return var, loaded, skipped


def load_mink_resnet_into_variables(variables, torch_state_dict, depth=34,
                                    prefix=('trunk', 'MinkResNet_0'),
                                    src_prefix='backbone_3d.', flip=False):
    """Merge converted reference MinkResNet weights into model variables.

    Same skip-on-mismatch semantics as :func:`load_resnet_into_variables`.
    """
    params, stats = convert_mink_resnet(torch_state_dict, depth,
                                        prefix=src_prefix, flip=flip)
    return _merge_into(variables, params, stats, prefix)


# ---------------------------------------------------------------------------
# HF RoBERTa (torch) -> Flax RoBERTa module tree
# ---------------------------------------------------------------------------

def convert_roberta(state_dict: Dict[str, np.ndarray],
                    prefix: str = 'text_encoder.'):
    """Torch ``RobertaModel`` state_dict -> FlaxRobertaModule params tree.

    The reference loads ``RobertaModel.from_pretrained('roberta-base')``
    (sparse_featfusion_grounder.py:107-109); the same weights dropped into
    the Flax module give bit-identical text features. Linear weights
    transpose (torch (out, in) -> flax kernel (in, out)); embeddings and
    LayerNorms copy through.
    """
    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    params: Dict = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def dense(dst, src):
        put(dst + ('kernel',), sd[src + '.weight'].T)
        put(dst + ('bias',), sd[src + '.bias'])

    def lnorm(dst, src):
        put(dst + ('scale',), sd[src + '.weight'])
        put(dst + ('bias',), sd[src + '.bias'])

    put(('embeddings', 'word_embeddings', 'embedding'),
        sd['embeddings.word_embeddings.weight'])
    put(('embeddings', 'position_embeddings', 'embedding'),
        sd['embeddings.position_embeddings.weight'])
    put(('embeddings', 'token_type_embeddings', 'embedding'),
        sd['embeddings.token_type_embeddings.weight'])
    lnorm(('embeddings', 'LayerNorm'), 'embeddings.LayerNorm')

    i = 0
    while f'encoder.layer.{i}.attention.self.query.weight' in sd:
        src = f'encoder.layer.{i}'
        dst = ('encoder', 'layer', str(i))
        dense(dst + ('attention', 'self', 'query'),
              src + '.attention.self.query')
        dense(dst + ('attention', 'self', 'key'), src + '.attention.self.key')
        dense(dst + ('attention', 'self', 'value'),
              src + '.attention.self.value')
        dense(dst + ('attention', 'output', 'dense'),
              src + '.attention.output.dense')
        lnorm(dst + ('attention', 'output', 'LayerNorm'),
              src + '.attention.output.LayerNorm')
        dense(dst + ('intermediate', 'dense'), src + '.intermediate.dense')
        dense(dst + ('output', 'dense'), src + '.output.dense')
        lnorm(dst + ('output', 'LayerNorm'), src + '.output.LayerNorm')
        i += 1
    if 'pooler.dense.weight' in sd:
        dense(('pooler', 'dense'), 'pooler')
    return params


def load_roberta_into_variables(variables, torch_state_dict,
                                prefix=('text_encoder',
                                        'FlaxRobertaModule_0'),
                                src_prefix='text_encoder.'):
    """Merge torch RoBERTa weights into the grounder's text encoder."""
    params = convert_roberta(torch_state_dict, prefix=src_prefix)
    return _merge_into(variables, params, {}, prefix)


# ---------------------------------------------------------------------------
# Reference FCAF3D head (detection checkpoint) -> our FCAF3DHead tree
# ---------------------------------------------------------------------------

def convert_fcaf_head(state_dict: Dict[str, np.ndarray], n_levels: int = 4,
                      prefix: str = 'bbox_head.', flip: bool = False):
    """Reference ``FCAF3DHeadRotMat`` weights -> (params, batch_stats).

    Maps the reference's per-level modules (fcaf3d_head.py:926-985:
    ``up_block_{i} = Sequential(tconv, bn, elu, conv, bn, elu)``,
    ``out_block_{i} = Sequential(conv, bn, elu)``, 1x1 ``conv_center`` /
    ``conv_reg`` / ``conv_cls`` and per-level ``scales.{i}.scale``) onto our
    flat names (models/fcaf3d.py:209-255: ``up_block_{i}_tconv/_bn1/_conv/
    _bn2``, ``out_block_{i}_conv/_bn``, Dense heads, a ``scales`` vector),
    with the ME kernel-row permutation on every spatial kernel (k=2 for the
    generative transpose, k=3 for convs).
    """
    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def bn_get(name, field):
        for key in (f'{name}.bn.{field}', f'{name}.{field}'):
            if key in sd:
                return sd[key]
        raise KeyError(f'{prefix}{name}.{field} not in state dict')

    def put_bn(dst, src):
        put(params, (dst, 'scale'), bn_get(src, 'weight'))
        put(params, (dst, 'bias'), bn_get(src, 'bias'))
        put(stats, (dst, 'mean'), bn_get(src, 'running_mean'))
        put(stats, (dst, 'var'), bn_get(src, 'running_var'))

    for i in range(1, n_levels):
        put(params, (f'up_block_{i}_tconv',),
            _me_kernel(sd[f'up_block_{i}.0.kernel'], flip))
        put_bn(f'up_block_{i}_bn1', f'up_block_{i}.1')
        put(params, (f'up_block_{i}_conv', 'kernel'),
            _me_kernel(sd[f'up_block_{i}.3.kernel'], flip))
        put_bn(f'up_block_{i}_bn2', f'up_block_{i}.4')
    for i in range(n_levels):
        put(params, (f'out_block_{i}_conv', 'kernel'),
            _me_kernel(sd[f'out_block_{i}.0.kernel'], flip))
        put_bn(f'out_block_{i}_bn', f'out_block_{i}.1')
    put(params, ('conv_center', 'kernel'),
        _me_pointwise(sd['conv_center.kernel']))
    put(params, ('conv_reg', 'kernel'), _me_pointwise(sd['conv_reg.kernel']))
    put(params, ('conv_cls', 'kernel'), _me_pointwise(sd['conv_cls.kernel']))
    if 'conv_cls.bias' in sd:
        put(params, ('conv_cls', 'bias'), sd['conv_cls.bias'].reshape(-1))
    put(params, ('scales',),
        np.array([float(np.asarray(sd[f'scales.{i}.scale']).reshape(()))
                  for i in range(n_levels)], np.float32))
    return params, stats


def load_reference_detector(variables, torch_state_dict, mink_depth=34,
                            resnet_depth=50, flip=False):
    """Load a full reference detection checkpoint into SparseFusionDetector.

    Covers the three trainable groups of
    ``SparseFeatureFusionSingleStage3DDetector`` (detector attrs at
    sparse_featfusion_single_stage.py:67-75): ``backbone`` (2D torchvision
    ResNet), ``backbone_3d`` (MinkResNet) and ``bbox_head``. Returns
    (variables, n_loaded, skipped_paths).
    """
    var = variables
    # each group is optional so partial checkpoints (head-only dumps,
    # backbone warm starts) load whatever they contain — same contract as
    # load_reference_grounder
    n1 = n2 = n3 = 0
    s1, s2, s3 = [], [], []
    if 'backbone.conv1.weight' in torch_state_dict:
        var, n1, s1 = load_resnet_into_variables(
            var,
            {k[len('backbone.'):]: v for k, v in torch_state_dict.items()
             if k.startswith('backbone.')},
            depth=resnet_depth, prefix=('trunk', 'ResNet_0'))
    if any(k.startswith('backbone_3d.') for k in torch_state_dict):
        var, n2, s2 = load_mink_resnet_into_variables(
            var, torch_state_dict, depth=mink_depth,
            prefix=('trunk', 'MinkResNet_0'), src_prefix='backbone_3d.',
            flip=flip)
    if any(k.startswith('bbox_head.') for k in torch_state_dict):
        hp, hs = convert_fcaf_head(torch_state_dict, flip=flip)
        var, n3, s3 = _merge_into(var, hp, hs, ('bbox_head',))
    return var, n1 + n2 + n3, s1 + s2 + s3


# ---------------------------------------------------------------------------
# Reference grounding checkpoint -> our SparseFusionGrounder tree
# ---------------------------------------------------------------------------

def _put(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _torch_linear(params, dst, sd, src):
    _put(params, dst + ('kernel',), sd[src + '.weight'].T)
    if src + '.bias' in sd:
        _put(params, dst + ('bias',), sd[src + '.bias'])


def _torch_mha(params, dst, sd, src, num_heads):
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention.

    in_proj (3E, E) splits into q/k/v (E, E); flax kernels are
    (E, H, E/H) for q/k/v and (H, E/H, E) for out.
    """
    w = sd[src + '.attn.in_proj_weight']
    b = sd[src + '.attn.in_proj_bias']
    e = w.shape[1]
    hd = e // num_heads
    for i, name in enumerate(('query', 'key', 'value')):
        wi = w[i * e:(i + 1) * e]  # (E, E) out x in
        bi = b[i * e:(i + 1) * e]
        _put(params, dst + (name, 'kernel'),
             wi.T.reshape(e, num_heads, hd))
        _put(params, dst + (name, 'bias'), bi.reshape(num_heads, hd))
    wo = sd[src + '.attn.out_proj.weight']  # (E, E)
    _put(params, dst + ('out', 'kernel'), wo.T.reshape(num_heads, hd, e))
    _put(params, dst + ('out', 'bias'), sd[src + '.attn.out_proj.bias'])


def _torch_ln(params, dst, sd, src):
    _put(params, dst + ('scale',), sd[src + '.weight'])
    _put(params, dst + ('bias',), sd[src + '.bias'])


def _posembed(params, stats, dst, sd, src):
    """PositionEmbeddingLearned: Conv1d(k=1)+BN1d+ReLU+Conv1d(k=1)
    (reference decoder.py:20-34) -> Dense + MaskedBatchNorm + Dense."""
    head = src + '.position_embedding_head'
    _put(params, dst + ('Dense_0', 'kernel'), sd[head + '.0.weight'][:, :, 0].T)
    _put(params, dst + ('Dense_0', 'bias'), sd[head + '.0.bias'])
    _put(params, dst + ('MaskedBatchNorm_0', 'scale'), sd[head + '.1.weight'])
    _put(params, dst + ('MaskedBatchNorm_0', 'bias'), sd[head + '.1.bias'])
    _put(stats, dst + ('MaskedBatchNorm_0', 'mean'),
         sd[head + '.1.running_mean'])
    _put(stats, dst + ('MaskedBatchNorm_0', 'var'),
         sd[head + '.1.running_var'])
    _put(params, dst + ('Dense_1', 'kernel'), sd[head + '.3.weight'][:, :, 0].T)
    _put(params, dst + ('Dense_1', 'bias'), sd[head + '.3.bias'])


def convert_mink_neck(state_dict, n_levels: int = 4,
                      prefix: str = 'neck_3d.', flip: bool = False):
    """Reference MinkNeck (mink_neck.py:102-131) -> our neck tree.

    Same per-level up/out block layout as the FCAF head, plus the biased
    1x1 ``conv_cls`` score head.
    """
    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    params, stats = {}, {}

    def bn(dst, src):
        for key in (f'{src}.bn.', f'{src}.'):
            if key + 'weight' in sd:
                _put(params, dst + ('scale',), sd[key + 'weight'])
                _put(params, dst + ('bias',), sd[key + 'bias'])
                _put(stats, dst + ('mean',), sd[key + 'running_mean'])
                _put(stats, dst + ('var',), sd[key + 'running_var'])
                return
        raise KeyError(f'{prefix}{src} batchnorm not in state dict')

    for i in range(1, n_levels):
        _put(params, (f'up_block_{i}_tconv',),
             _me_kernel(sd[f'up_block_{i}.0.kernel'], flip))
        bn((f'up_block_{i}_bn1',), f'up_block_{i}.1')
        _put(params, (f'up_block_{i}_conv', 'kernel'),
             _me_kernel(sd[f'up_block_{i}.3.kernel'], flip))
        bn((f'up_block_{i}_bn2',), f'up_block_{i}.4')
    for i in range(n_levels):
        _put(params, (f'out_block_{i}_conv', 'kernel'),
             _me_kernel(sd[f'out_block_{i}.0.kernel'], flip))
        bn((f'out_block_{i}_bn',), f'out_block_{i}.1')
    _put(params, ('conv_cls', 'kernel'), _me_pointwise(sd['conv_cls.kernel']))
    _put(params, ('conv_cls', 'bias'), sd['conv_cls.bias'].reshape(-1))
    return params, stats


def convert_ground_decoder(state_dict, num_layers: int = 6,
                           num_heads: int = 8, prefix: str = 'decoder.'):
    """Reference SparseFeatureFusionTransformerDecoder -> our decoder tree.

    Maps per-layer self/text/point attention + FFN + 4 norms
    (decoder.py:92-180), the decoder-level learned posembeds and final norm
    (decoder.py:211-222). The per-LAYER ``self_posembed`` modules the
    reference constructs but never calls in the decoder forward
    (decoder.py:103 vs :270) are ignored.
    """
    sd = {k[len(prefix):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith(prefix)}
    params, stats = {}, {}
    for i in range(num_layers):
        src = f'layers.{i}'
        dst = (f'layer{i}',)
        _torch_mha(params, dst + ('self_attn',), sd, f'{src}.self_attn',
                   num_heads)
        _torch_mha(params, dst + ('cross_attn_text',), sd,
                   f'{src}.cross_attn_text', num_heads)
        _torch_mha(params, dst + ('cross_attn',), sd, f'{src}.cross_attn',
                   num_heads)
        _torch_linear(params, dst + ('ffn_fc1',), sd,
                      f'{src}.ffn.layers.0.0')
        _torch_linear(params, dst + ('ffn_fc2',), sd, f'{src}.ffn.layers.1')
        for n in range(4):
            _torch_ln(params, dst + (f'norm{n}',), sd, f'{src}.norms.{n}')
    _posembed(params, stats, ('self_posembed',), sd, 'self_posembed')
    _posembed(params, stats, ('cross_posembed',), sd, 'cross_posembed')
    _torch_ln(params, ('decoder_norm',), sd, 'norm')
    return params, stats


def load_reference_grounder(variables, torch_state_dict, mink_depth=34,
                            resnet_depth=50, num_layers=6, num_heads=8,
                            flip=False):
    """Load a full reference grounding checkpoint into SparseFusionGrounder.

    Covers every trainable group of ``SparseFeatureFusion3DGrounder``
    (sparse_featfusion_grounder.py:78-116): 2D/3D backbones, MinkNeck,
    RoBERTa + text_feat_map, decoder, and the shared grounding-head
    branches (share_pred_layer=True: ``reg_branches.0`` Sequential(0/2/4
    Linears) -> fc0/fc1/out, ``cls_branches.0.bias`` -> ContrastiveEmbed).
    Returns (variables, n_loaded, skipped_paths).
    """
    sd = torch_state_dict
    var = variables
    # each group is optional: partial checkpoints (backbone-only warm
    # starts, text-frozen dumps) load whatever they contain
    n1 = n2 = n4 = 0
    s1, s2, s4 = [], [], []
    if 'backbone.conv1.weight' in sd:
        var, n1, s1 = load_resnet_into_variables(
            var,
            {k[len('backbone.'):]: v for k, v in sd.items()
             if k.startswith('backbone.')},
            depth=resnet_depth, prefix=('trunk', 'ResNet_0'))
    if 'backbone_3d.conv1.kernel' in sd:
        var, n2, s2 = load_mink_resnet_into_variables(
            var, sd, depth=mink_depth, prefix=('trunk', 'MinkResNet_0'),
            src_prefix='backbone_3d.', flip=flip)
    np_, ns_ = convert_mink_neck(sd, flip=flip)
    var, n3, s3 = _merge_into(var, np_, ns_, ('neck',))
    if 'text_encoder.embeddings.word_embeddings.weight' in sd:
        var, n4, s4 = load_roberta_into_variables(
            var, sd, prefix=('text_encoder', 'FlaxRobertaModule_0'),
            src_prefix='text_encoder.')
    tp = {}
    if 'text_feat_map.weight' in sd:
        _torch_linear(tp, (), sd, 'text_feat_map')
        var, n5, s5 = _merge_into(var, tp, {}, ('text_encoder', 'Dense_0'))
    else:
        n5, s5 = 0, []
    dp, ds = convert_ground_decoder(sd, num_layers=num_layers,
                                    num_heads=num_heads)
    var, n6, s6 = _merge_into(var, dp, ds, ())
    hp = {}
    _torch_linear(hp, ('fc0',), sd, 'bbox_head.reg_branches.0.0')
    _torch_linear(hp, ('fc1',), sd, 'bbox_head.reg_branches.0.2')
    _torch_linear(hp, ('out',), sd, 'bbox_head.reg_branches.0.4')
    var, n7, s7 = _merge_into(var, hp, {}, ('reg_branch',))
    cp = {}
    if 'bbox_head.cls_branches.0.bias' in sd:
        _put(cp, ('bias',), sd['bbox_head.cls_branches.0.bias'].reshape(-1))
        var, n8, s8 = _merge_into(var, cp, {}, ('cls_embed',))
    else:
        n8, s8 = 0, []
    total = n1 + n2 + n3 + n4 + n5 + n6 + n7 + n8
    skipped = s1 + s2 + s3 + s4 + s5 + s6 + s7 + s8
    return var, total, skipped
