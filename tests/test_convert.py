"""torch -> Flax conversion: numerical parity of the converted CosPlace
model against the torch original (torchvision resnet18 + GeM head)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax.traverse_util import unflatten_dict

from cslam_tpu.models import convert
from cslam_tpu.models.cosplace import GeoLocalizationNet


class TorchGeM(torch.nn.Module):
    def __init__(self, p=3.0, eps=1e-6):
        super().__init__()
        self.p = torch.nn.Parameter(torch.ones(1) * p)
        self.eps = eps

    def forward(self, x):
        return torch.nn.functional.avg_pool2d(
            x.clamp(min=self.eps).pow(self.p),
            (x.size(-2), x.size(-1))).pow(1.0 / self.p)


class TorchBasicBlock(torch.nn.Module):
    """torchvision.models.resnet.BasicBlock clone (same param names)."""

    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(in_ch, out_ch, 3, stride, 1,
                                     bias=False)
        self.bn1 = torch.nn.BatchNorm2d(out_ch)
        self.conv2 = torch.nn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(out_ch)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                torch.nn.BatchNorm2d(out_ch))

    def forward(self, x):
        identity = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return torch.relu(out + identity)


class TorchResNet18(torch.nn.Module):
    """torchvision resnet18 conv trunk clone (same state_dict keys)."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        in_ch = 64
        for stage, w in enumerate(widths):
            blocks = []
            for b in range(2):
                stride = 2 if (b == 0 and stage > 0) else 1
                blocks.append(TorchBasicBlock(in_ch, w, stride))
                in_ch = w
            setattr(self, f"layer{stage + 1}", torch.nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for stage in range(1, 5):
            x = getattr(self, f"layer{stage}")(x)
        return x


class TorchCosPlace(torch.nn.Module):
    """Reference GeoLocalizationNet shape: resnet18 trunk -> L2 -> GeM ->
    Linear -> L2 (cosplace_utils/network.py:30-45)."""

    def __init__(self, fc_output_dim=32):
        super().__init__()
        self._resnet = TorchResNet18()
        self.gem = TorchGeM()
        self.fc = torch.nn.Linear(512, fc_output_dim)

    def forward(self, x):
        x = self._resnet(x)
        x = torch.nn.functional.normalize(x, p=2.0, dim=1)
        x = self.gem(x)
        x = x[:, :, 0, 0]
        x = self.fc(x)
        return torch.nn.functional.normalize(x, p=2.0, dim=1)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = TorchCosPlace(fc_output_dim=32)
    model.eval()
    # non-trivial batchnorm stats
    with torch.no_grad():
        model.train()
        for _ in range(3):
            model(torch.randn(4, 3, 64, 64))
        model.eval()
    return model


def test_cosplace_conversion_matches_torch(torch_model):
    state = {}
    for k, v in torch_model._resnet.state_dict().items():
        state[k] = v.numpy()
    state["gem.p"] = torch_model.gem.p.detach().numpy()
    state["fc.weight"] = torch_model.fc.weight.detach().numpy()
    state["fc.bias"] = torch_model.fc.bias.detach().numpy()

    flat = convert.convert_cosplace(state)
    variables = unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})

    # use float32 compute in flax for a tight comparison
    model = GeoLocalizationNet(fc_output_dim=32, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_superpoint_conversion_shapes():
    from cslam_tpu.models.superpoint import SuperPointNet
    import jax

    # synthetic magicleap-layout state dict
    rng = np.random.default_rng(2)
    dims = [(64, 1), (64, 64), (64, 64), (64, 64), (128, 64), (128, 128),
            (128, 128), (128, 128), (256, 128), (65, 256), (256, 128),
            (256, 256)]
    names = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
             "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]
    state = {}
    for (o, i), name in zip(dims, names):
        k = 1 if name in ("convPb", "convDb") else 3
        state[f"{name}.weight"] = rng.standard_normal(
            (o, i, k, k)).astype(np.float32) * 0.05
        state[f"{name}.bias"] = np.zeros(o, dtype=np.float32)
    flat = convert.convert_superpoint(state)
    variables = unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})
    model = SuperPointNet(dtype=jnp.float32)
    det, desc = model.apply(variables, jnp.zeros((1, 64, 64, 1)))
    assert det.shape == (1, 8, 8, 65)
    assert desc.shape == (1, 8, 8, 256)
