"""Weight conversion tests: numerical parity of torch ResNet vs our flax one."""

import numpy as np

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from embodiedscan_tpu.models.resnet2d import ResNet
from embodiedscan_tpu.utils.convert_weights import (
    convert_torchvision_resnet, load_resnet_into_variables)


def make_torch_basicblock_resnet18(base=16):
    """Minimal torchvision-layout ResNet-18 in torch for oracle outputs."""

    class Block(tnn.Module):

        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idt)

    class Net(tnn.Module):

        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, base, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(base)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            chans = [base, base * 2, base * 4, base * 8]
            cin = base
            for i, c in enumerate(chans):
                stride = 1 if i == 0 else 2
                blocks = tnn.Sequential(Block(cin, c, stride), Block(c, c, 1))
                setattr(self, f'layer{i + 1}', blocks)
                cin = c

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            outs = []
            for i in range(4):
                x = getattr(self, f'layer{i + 1}')(x)
                outs.append(x)
            return outs

    return Net()


class TestConvert:

    def test_resnet18_numerical_parity(self):
        torch.manual_seed(0)
        net = make_torch_basicblock_resnet18()
        net.eval()
        # randomize BN stats so the test is nontrivial
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.data.uniform_(0.5, 1.5)
                m.bias.data.uniform_(-0.5, 0.5)

        x = torch.randn(2, 3, 64, 64)
        with torch.no_grad():
            want = [o.numpy() for o in net(x)]

        model = ResNet(depth=18, base_channels=16)
        xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
        variables = model.init(jax.random.PRNGKey(0), xj)
        sd = {k: v.numpy() for k, v in net.state_dict().items()}
        variables, loaded, skipped = load_resnet_into_variables(
            variables, sd, depth=18, prefix=())
        assert loaded > 50, (loaded, skipped[:5])
        assert not skipped, skipped[:8]
        got = model.apply(variables, xj)
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.transpose(np.asarray(g), (0, 3, 1, 2)), w, atol=2e-4)

    def test_shape_mismatch_skipped(self):
        # 64-wide torchvision weights into the 16-wide model: skip, no crash
        torch.manual_seed(0)
        net = make_torch_basicblock_resnet18(base=64)
        model = ResNet(depth=18, base_channels=16)
        xj = jnp.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), xj)
        sd = {k: v.numpy() for k, v in net.state_dict().items()}
        variables, loaded, skipped = load_resnet_into_variables(
            variables, sd, depth=18, prefix=())
        assert loaded == 0
        assert len(skipped) > 50


class TestMinkResNetConversion:
    """ME-layout checkpoint -> our MinkResNet tree (SURVEY §2b gap 1)."""

    def _fake_me_sd(self, depth=18, in_ch=3):
        """Synthetic reference state dict with ME shapes/names."""
        rng = np.random.RandomState(0)
        n_blocks = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}[depth]
        sd = {}
        sd['backbone_3d.conv1.kernel'] = rng.randn(27, in_ch, 64)
        sd['backbone_3d.norm1.inst_norm.weight'] = rng.randn(64)
        sd['backbone_3d.norm1.inst_norm.bias'] = rng.randn(64)
        inp = 64
        for i, blocks in enumerate(n_blocks):
            planes = 64 * 2**i
            for j in range(blocks):
                p = f'backbone_3d.layer{i + 1}.{j}'
                cin = inp if j == 0 else planes
                sd[f'{p}.conv1.kernel'] = rng.randn(27, cin, planes)
                sd[f'{p}.conv2.kernel'] = rng.randn(27, planes, planes)
                for n in (1, 2):
                    sd[f'{p}.norm{n}.bn.weight'] = rng.randn(planes)
                    sd[f'{p}.norm{n}.bn.bias'] = rng.randn(planes)
                    sd[f'{p}.norm{n}.bn.running_mean'] = rng.randn(planes)
                    sd[f'{p}.norm{n}.bn.running_var'] = np.abs(
                        rng.randn(planes)) + 0.5
                if j == 0:
                    sd[f'{p}.downsample.0.kernel'] = rng.randn(cin, planes)
                    sd[f'{p}.downsample.1.bn.weight'] = rng.randn(planes)
                    sd[f'{p}.downsample.1.bn.bias'] = rng.randn(planes)
                    sd[f'{p}.downsample.1.bn.running_mean'] = rng.randn(planes)
                    sd[f'{p}.downsample.1.bn.running_var'] = np.abs(
                        rng.randn(planes)) + 0.5
            inp = planes
        return sd

    def test_kernel_permutation_props(self):
        from embodiedscan_tpu.utils.convert_weights import \
            me_kernel_permutation
        for k, n in ((3, 27), (2, 8)):
            perm = me_kernel_permutation(k)
            assert sorted(perm) == list(range(n))
        # center offset is a fixed point of the odd-kernel permutation
        assert me_kernel_permutation(3)[13] == 13
        # x-fastest vs z-fastest: our index 0 = (-1,-1,-1) = ME index 0,
        # our index 1 = (-1,-1,0) = ME offset (z=0 -> me idx 9)
        assert me_kernel_permutation(3)[0] == 0
        assert me_kernel_permutation(3)[1] == 9

    def test_loads_into_model(self):
        import jax
        import jax.numpy as jnp

        from embodiedscan_tpu.models.sparse_nn import MinkResNet
        from embodiedscan_tpu.ops import sparse as S
        from embodiedscan_tpu.utils.convert_weights import \
            load_mink_resnet_into_variables
        rng = np.random.RandomState(1)
        coords = jnp.asarray(rng.randint(0, 32, (1, 64, 3)), jnp.int32)
        st = S.SparseTensor(coords,
                            jnp.asarray(rng.randn(1, 64, 3),
                                        jnp.float32),
                            jnp.ones((1, 64), bool))
        model = MinkResNet(depth=18, capacities=(64, 64, 64, 32, 16, 8))
        variables = jax.jit(lambda r: model.init(r, st, train=False))(
            jax.random.PRNGKey(0))
        sd = self._fake_me_sd(depth=18)
        var, loaded, skipped = load_mink_resnet_into_variables(
            variables, sd, depth=18, prefix=())
        assert not skipped, skipped[:5]
        # every param + stat leaf covered
        n_leaves = len(jax.tree_util.tree_leaves(variables))
        assert loaded == n_leaves
        # kernel rows permuted per the documented map: our row 1 = ME row 9
        got = var['params']['SparseConv_0']['kernel']
        np.testing.assert_allclose(
            got[1], sd['backbone_3d.conv1.kernel'][9])
        # converted weights still run
        out = model.apply(var, st, train=False)
        assert all(np.isfinite(np.asarray(o.feats)).all() for o in out)


class TestRobertaConversion:
    """Torch RobertaModel -> Flax module: numerical parity on tiny sizes
    (reference text path: sparse_featfusion_grounder.py:107-116)."""

    def test_numerical_parity(self):
        from transformers import RobertaConfig, RobertaModel
        from transformers.models.roberta.modeling_flax_roberta import \
            FlaxRobertaModule

        from embodiedscan_tpu.utils.convert_weights import \
            load_roberta_into_variables

        cfg = RobertaConfig(vocab_size=100, hidden_size=32,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=64,
                            max_position_embeddings=40, type_vocab_size=1,
                            pad_token_id=1)
        torch.manual_seed(0)
        net = RobertaModel(cfg, add_pooling_layer=False).eval()
        ids = torch.randint(4, 100, (2, 10))
        mask = torch.ones(2, 10, dtype=torch.long)
        with torch.no_grad():
            want = net(input_ids=ids,
                       attention_mask=mask).last_hidden_state.numpy()

        module = FlaxRobertaModule(cfg, add_pooling_layer=False)
        idsj = jnp.asarray(ids.numpy())
        maskj = jnp.asarray(mask.numpy())
        pos = jnp.cumsum(maskj, -1) * maskj + 1
        tok = jnp.zeros_like(idsj)
        variables = jax.jit(lambda r: module.init(r, idsj, maskj, tok, pos))(
            jax.random.PRNGKey(0))
        sd = {k: v.numpy() for k, v in net.state_dict().items()}
        var, loaded, skipped = load_roberta_into_variables(
            variables, sd, prefix=(), src_prefix='')
        assert not skipped, skipped[:8]
        n_leaves = len(jax.tree_util.tree_leaves(variables))
        assert loaded == n_leaves, (loaded, n_leaves)
        got = module.apply(var, idsj, maskj, tok, pos,
                           deterministic=True).last_hidden_state
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


class TestFCAFHeadConversion:
    """Reference FCAF3DHeadRotMat state dict -> our head tree."""

    def _fake_head_sd(self, in_channels=(80, 160, 320, 640), out=128,
                      num_classes=5, num_reg=12):
        rng = np.random.RandomState(0)
        sd = {}
        for i in range(1, 4):
            cin, cout = in_channels[i], in_channels[i - 1]
            sd[f'bbox_head.up_block_{i}.0.kernel'] = rng.randn(8, cin, cout)
            sd[f'bbox_head.up_block_{i}.3.kernel'] = rng.randn(27, cout, cout)
            for idx in (1, 4):
                p = f'bbox_head.up_block_{i}.{idx}'
                sd[f'{p}.bn.weight'] = rng.randn(cout)
                sd[f'{p}.bn.bias'] = rng.randn(cout)
                sd[f'{p}.bn.running_mean'] = rng.randn(cout)
                sd[f'{p}.bn.running_var'] = np.abs(rng.randn(cout)) + 0.5
        for i in range(4):
            cin = in_channels[i]
            sd[f'bbox_head.out_block_{i}.0.kernel'] = rng.randn(27, cin, out)
            p = f'bbox_head.out_block_{i}.1'
            sd[f'{p}.bn.weight'] = rng.randn(out)
            sd[f'{p}.bn.bias'] = rng.randn(out)
            sd[f'{p}.bn.running_mean'] = rng.randn(out)
            sd[f'{p}.bn.running_var'] = np.abs(rng.randn(out)) + 0.5
        sd['bbox_head.conv_center.kernel'] = rng.randn(out, 1)
        sd['bbox_head.conv_reg.kernel'] = rng.randn(out, num_reg)
        sd['bbox_head.conv_cls.kernel'] = rng.randn(out, num_classes)
        sd['bbox_head.conv_cls.bias'] = rng.randn(num_classes)
        for i in range(4):
            sd[f'bbox_head.scales.{i}.scale'] = np.array(1.0 + 0.1 * i)
        return sd

    def test_merges_into_detector(self):
        import __graft_entry__ as g
        from embodiedscan_tpu.utils.convert_weights import (_merge_into,
                                                            convert_fcaf_head)
        model = g._tiny_model()
        batch = g._tiny_batch()
        variables = jax.jit(lambda r, b: model.init(
            r, b, train=False, mode='feats'))(jax.random.PRNGKey(0), batch)
        sd = self._fake_head_sd()
        hp, hs = convert_fcaf_head(sd)
        var, loaded, skipped = _merge_into(variables, hp, hs, ('bbox_head',))
        assert not skipped, skipped[:8]
        # every leaf the converter emits lands: 35 params (18 up-block +
        # 12 out-block + 4 head convs + scales) + 20 bn stats
        assert loaded == 55, loaded
        # scales vector assembled from per-level scalars
        np.testing.assert_allclose(
            np.asarray(var['params']['bbox_head']['scales']),
            [1.0, 1.1, 1.2, 1.3])
        # tconv rows follow the k=2 ME permutation: our row 1 = (0,0,1)
        # = ME row 4 (z varies slowest in our order, fastest in ME's)
        got = var['params']['bbox_head']['up_block_1_tconv']
        np.testing.assert_allclose(
            got[1], sd['bbox_head.up_block_1.0.kernel'][4])


class TestGrounderConversion:
    """Full reference grounding checkpoint -> our SparseFusionGrounder."""

    def _fake_grounder_sd(self, in_channels=(80, 160, 320, 640), e=32,
                          heads=8, layers=2, ffn=2048):
        rng = np.random.RandomState(0)
        sd = {}
        # neck_3d (MinkNeck): same block layout as the FCAF head + conv_cls
        for i in range(1, 4):
            cin, cout = in_channels[i], in_channels[i - 1]
            sd[f'neck_3d.up_block_{i}.0.kernel'] = rng.randn(8, cin, cout)
            sd[f'neck_3d.up_block_{i}.3.kernel'] = rng.randn(27, cout, cout)
            for idx in (1, 4):
                p = f'neck_3d.up_block_{i}.{idx}'
                sd[f'{p}.bn.weight'] = rng.randn(cout)
                sd[f'{p}.bn.bias'] = rng.randn(cout)
                sd[f'{p}.bn.running_mean'] = rng.randn(cout)
                sd[f'{p}.bn.running_var'] = np.abs(rng.randn(cout)) + 0.5
        for i in range(4):
            cin = in_channels[i]
            sd[f'neck_3d.out_block_{i}.0.kernel'] = rng.randn(27, cin, e)
            p = f'neck_3d.out_block_{i}.1'
            sd[f'{p}.bn.weight'] = rng.randn(e)
            sd[f'{p}.bn.bias'] = rng.randn(e)
            sd[f'{p}.bn.running_mean'] = rng.randn(e)
            sd[f'{p}.bn.running_var'] = np.abs(rng.randn(e)) + 0.5
        sd['neck_3d.conv_cls.kernel'] = rng.randn(e, 1)
        sd['neck_3d.conv_cls.bias'] = rng.randn(1)
        # decoder layers (mmcv MultiheadAttention wraps .attn)
        for i in range(layers):
            for a in ('self_attn', 'cross_attn_text', 'cross_attn'):
                p = f'decoder.layers.{i}.{a}.attn'
                sd[f'{p}.in_proj_weight'] = rng.randn(3 * e, e)
                sd[f'{p}.in_proj_bias'] = rng.randn(3 * e)
                sd[f'{p}.out_proj.weight'] = rng.randn(e, e)
                sd[f'{p}.out_proj.bias'] = rng.randn(e)
            sd[f'decoder.layers.{i}.ffn.layers.0.0.weight'] = \
                rng.randn(ffn, e)
            sd[f'decoder.layers.{i}.ffn.layers.0.0.bias'] = rng.randn(ffn)
            sd[f'decoder.layers.{i}.ffn.layers.1.weight'] = rng.randn(e, ffn)
            sd[f'decoder.layers.{i}.ffn.layers.1.bias'] = rng.randn(e)
            for n in range(4):
                sd[f'decoder.layers.{i}.norms.{n}.weight'] = rng.randn(e)
                sd[f'decoder.layers.{i}.norms.{n}.bias'] = rng.randn(e)
        # decoder-level posembeds + final norm
        for name, cin in (('self_posembed', 9), ('cross_posembed', 3)):
            h = f'decoder.{name}.position_embedding_head'
            sd[f'{h}.0.weight'] = rng.randn(e, cin, 1)
            sd[f'{h}.0.bias'] = rng.randn(e)
            sd[f'{h}.1.weight'] = rng.randn(e)
            sd[f'{h}.1.bias'] = rng.randn(e)
            sd[f'{h}.1.running_mean'] = rng.randn(e)
            sd[f'{h}.1.running_var'] = np.abs(rng.randn(e)) + 0.5
            sd[f'{h}.3.weight'] = rng.randn(e, e, 1)
            sd[f'{h}.3.bias'] = rng.randn(e)
        sd['decoder.norm.weight'] = rng.randn(e)
        sd['decoder.norm.bias'] = rng.randn(e)
        # shared head branches (share_pred_layer=True)
        sd['bbox_head.reg_branches.0.0.weight'] = rng.randn(e, e)
        sd['bbox_head.reg_branches.0.0.bias'] = rng.randn(e)
        sd['bbox_head.reg_branches.0.2.weight'] = rng.randn(e, e)
        sd['bbox_head.reg_branches.0.2.bias'] = rng.randn(e)
        sd['bbox_head.reg_branches.0.4.weight'] = rng.randn(9, e)
        sd['bbox_head.reg_branches.0.4.bias'] = rng.randn(9)
        sd['bbox_head.cls_branches.0.bias'] = np.array([0.1])
        # unit-variance randn weights explode through the 2048-wide FFN
        # (finite-loss check below); scale everything but the BN variances
        return {k: v * (1.0 if 'running_var' in k else 0.05)
                for k, v in sd.items()}

    def test_merges_into_grounder(self):
        from test_grounding import grounding_batch, tiny_grounder

        from embodiedscan_tpu.utils.convert_weights import \
            load_reference_grounder
        rng = np.random.RandomState(0)
        model = tiny_grounder()
        batch = grounding_batch(rng)
        variables = jax.jit(lambda r, b: model.init(
            r, b, train=False, mode='feats'))(jax.random.PRNGKey(0), batch)
        sd = self._fake_grounder_sd()
        var, loaded, skipped = load_reference_grounder(
            variables, sd, num_layers=2, num_heads=8)
        assert not skipped, skipped[:8]
        # neck + decoder + posembeds + head branches all land: 72 decoder
        # layer leaves (2 layers) + 16 posembed + 2 decoder_norm + 50 neck
        # (30 params + 20 bn stats) + 2 conv_cls + 6 reg branch + 1 cls bias
        assert loaded == 149, loaded
        # attention q kernel transposed into (E, H, E/H)
        got = var['params']['layer0']['self_attn']['query']['kernel']
        e = 32
        want = sd['decoder.layers.0.self_attn.attn.in_proj_weight'][:e].T
        np.testing.assert_allclose(np.asarray(got).reshape(e, e), want)
        # converted weights still run the loss path
        out, _ = model.apply(
            {'params': var['params'], 'batch_stats': var['batch_stats']},
            batch, train=True, mode='loss', mutable=['batch_stats'])
        assert all(np.isfinite(float(v)) for v in out.values())
