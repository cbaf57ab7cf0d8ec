"""ResNet trunk (`TorchVision` YAML passthrough): activation parity against
a torch twin with torchvision-identical state-dict keys, and the
yolo11-cls-resnet18 config building + running end-to-end."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fce_yolo_tpu.nn.resnet import (  # noqa: E402
    ResNetTrunk,
    resnet_state_dict_to_variables,
)


class _TorchBasicBlock(tnn.Module):
    """torchvision.models.resnet.BasicBlock twin (same attribute names ->
    same state-dict keys as a real torchvision checkpoint)."""

    def __init__(self, c1, c2, s=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(c1, c2, 3, s, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(c2)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(c2, c2, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(c2)
        self.downsample = (
            tnn.Sequential(tnn.Conv2d(c1, c2, 1, s, bias=False), tnn.BatchNorm2d(c2))
            if (s != 1 or c1 != c2)
            else None
        )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class _TorchResNet18Trunk(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cfg = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
        for i, (c1, c2, s) in enumerate(cfg):
            setattr(self, f"layer{i + 1}",
                    tnn.Sequential(_TorchBasicBlock(c1, c2, s), _TorchBasicBlock(c2, c2)))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        return x


def _randomize(m: tnn.Module, seed: int = 0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for b in m.buffers():
            if b.dtype.is_floating_point:
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.5)


def test_resnet18_trunk_activation_parity():
    ref = _TorchResNet18Trunk().eval()
    _randomize(ref)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    assert "layer2.0.downsample.0.weight" in sd  # torchvision key layout

    variables = resnet_state_dict_to_variables(sd, "resnet18")
    trunk = ResNetTrunk("resnet18")
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    ours = trunk.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), theirs, rtol=1e-4, atol=1e-4
    )
    assert ours.shape == (1, 2, 2, 512)  # 64px / 32


def test_yolo11_cls_resnet18_builds_and_runs():
    """The one reference YAML previously excluded from the zoo sweep."""
    from fce_yolo_tpu.nn.model import build_model, init_variables

    yaml_path = "/root/reference/ultralytics/cfg/models/11/yolo11-cls-resnet18.yaml"
    import os

    if not os.path.exists(yaml_path):
        pytest.skip("reference checkout not present")
    model, spec, strides = build_model(yaml_path)
    v = init_variables(model, jax.random.PRNGKey(0), imgsz=64)
    out = model.apply(v, jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    probs = out["probs"] if isinstance(out, dict) else out
    assert np.asarray(probs).shape[-1] == 1000


def test_torchvision_module_rejects_unsupported():
    from fce_yolo_tpu.nn.resnet import TorchVision

    with pytest.raises(NotImplementedError):
        TorchVision(512, "efficientnet_b0").init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )
