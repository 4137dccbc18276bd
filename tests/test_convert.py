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
