"""Golden-activation validation of the pretrained-backbone port.

The round-1 converter test only checked a synthetic state_dict's shapes.
Here a REAL torch ResNet (torchvision v1.5 graph and state_dict naming,
defined below in plain torch) with randomized weights AND BatchNorm running
stats produces golden outputs on a fixed input; `port_torchvision_resnet`
maps its state_dict onto the Flax model and the fp32 outputs must agree.
This exercises everything the converter can get wrong: NCHW->NHWC kernel
transposes, stride placement (3x3 conv in bottlenecks), downsample wiring,
BN eps/affine mapping, pooling geometry, and the fc port.

Also covers the `face train --pretrained` wiring end-to-end
(reference backbones.py:12-26).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


# ---------------------------------------------------------------------------
# Minimal torchvision-v1.5-compatible ResNet (state_dict-key compatible)
# ---------------------------------------------------------------------------


class _BasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, in_c, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_c, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or in_c != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_c, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.bn1(self.conv1(x)).relu()
        y = self.bn2(self.conv2(y))
        return (y + idt).relu()


class _Bottleneck(tnn.Module):
    expansion = 4

    def __init__(self, in_c, planes, stride=1):
        super().__init__()
        out_c = planes * self.expansion
        self.conv1 = tnn.Conv2d(in_c, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        # v1.5: the stride sits on the 3x3 conv
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, out_c, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out_c)
        self.downsample = None
        if stride != 1 or in_c != out_c:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_c, out_c, 1, stride, bias=False),
                tnn.BatchNorm2d(out_c))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.bn1(self.conv1(x)).relu()
        y = self.bn2(self.conv2(y)).relu()
        y = self.bn3(self.conv3(y))
        return (y + idt).relu()


class _TorchResNet(tnn.Module):
    def __init__(self, block, stage_sizes, embed_dim=512):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        in_c = 64
        for i, blocks in enumerate(stage_sizes):
            planes = 64 * 2 ** i
            layers = []
            for j in range(blocks):
                stride = 2 if i > 0 and j == 0 else 1
                layers.append(block(in_c, planes, stride))
                in_c = planes * block.expansion
            setattr(self, f"layer{i + 1}", tnn.Sequential(*layers))
        self.fc = tnn.Linear(in_c, embed_dim)

    def forward(self, x):
        x = self.bn1(self.conv1(x)).relu()
        x = self.maxpool(x)
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def _randomize(model, seed):
    """Random weights AND non-trivial BN running stats."""
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if k.endswith("running_var") or ".1.running_var" in k:
                sd[k] = 0.5 + torch.rand(v.shape, generator=g)
            elif "weight" in k and v.ndim == 1:  # BN scale: keep positive-ish
                sd[k] = 0.5 + torch.rand(v.shape, generator=g)
            else:
                sd[k] = 0.1 * torch.randn(v.shape, generator=g)
    model.load_state_dict(sd)
    return model


@pytest.mark.parametrize("name,block,stages",
                         [("resnet18", _BasicBlock, (2, 2, 2, 2)),
                          pytest.param("resnet50", _Bottleneck, (3, 4, 6, 3),
                                       marks=pytest.mark.slow)])
def test_port_matches_torch_golden_activations(name, block, stages):
    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.utils.torch_port import (
        port_torchvision_resnet)

    tmodel = _randomize(_TorchResNet(block, stages), seed=7).eval()
    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x)).numpy()

    jmodel = get_backbone(name, dtype=jnp.float32)
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), train=False)
    params, stats = port_torchvision_resnet(
        tmodel.state_dict(), variables, stages, port_fc=True)

    with jax.default_matmul_precision("float32"):
        out = jmodel.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    # Random BN stats compound the activation scale through ~50 layers (the
    # resnet50 goldens reach ~1e7), so compare relative to the output scale.
    np.testing.assert_allclose(np.asarray(out), golden, rtol=2e-3,
                               atol=2e-4 * float(np.abs(golden).max()))


def test_load_pretrained_backbone_file_roundtrip(tmp_path):
    """`load_pretrained_backbone` reads a .pth (wrapped or bare) and ports."""
    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.utils.torch_port import (
        load_pretrained_backbone)

    tmodel = _randomize(_TorchResNet(_BasicBlock, (2, 2, 2, 2)), seed=3)
    path = tmp_path / "r18.pth"
    torch.save({"state_dict": tmodel.state_dict()}, path)

    jmodel = get_backbone("resnet18", dtype=jnp.float32)
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), train=False)
    params, stats = load_pretrained_backbone(str(path), "resnet18", variables)
    np.testing.assert_allclose(
        params["conv1"]["kernel"],
        tmodel.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0))

    with pytest.raises(ValueError, match="pretrained supports"):
        load_pretrained_backbone(str(path), "vgg16", variables)


@pytest.mark.slow
def test_load_pretrained_backbone_dispatches_mobilenet(tmp_path):
    """The file-loading entry point routes mobilenet_v2 to its porter."""
    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.utils.torch_port import (
        load_pretrained_backbone)

    tmodel = _randomize(_TorchMobileNetV2(), seed=13)
    path = tmp_path / "mb2.pth"
    torch.save(tmodel.state_dict(), path)

    jmodel = get_backbone("mobilenet_v2", dtype=jnp.float32)
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), train=False)
    params, stats = load_pretrained_backbone(str(path), "mobilenet_v2",
                                             variables)
    np.testing.assert_allclose(
        params["stem"]["kernel"],
        tmodel.state_dict()["features.0.0.weight"].numpy()
        .transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        stats["head_bn"]["mean"],
        tmodel.state_dict()["features.18.1.running_mean"].numpy())


# ---------------------------------------------------------------------------
# Minimal torchvision-compatible MobileNetV2 / EfficientNet-B0 replicas
# (state_dict-key compatible with torchvision, so the porters are exercised
# against the real checkpoint layout: models/mobilenetv2.py features.N.conv
# sequentials, models/efficientnet.py features.N.M.block + SE fc1/fc2).
# ---------------------------------------------------------------------------


class _TorchInvertedResidual(tnn.Module):
    def __init__(self, in_c, out_c, stride, t):
        super().__init__()
        hid = in_c * t
        self.use_skip = stride == 1 and in_c == out_c
        layers = []
        if t != 1:
            layers.append(tnn.Sequential(
                tnn.Conv2d(in_c, hid, 1, bias=False), tnn.BatchNorm2d(hid),
                tnn.ReLU6()))
        layers.append(tnn.Sequential(
            tnn.Conv2d(hid, hid, 3, stride, 1, groups=hid, bias=False),
            tnn.BatchNorm2d(hid), tnn.ReLU6()))
        layers.append(tnn.Conv2d(hid, out_c, 1, bias=False))
        layers.append(tnn.BatchNorm2d(out_c))
        self.conv = tnn.Sequential(*layers)

    def forward(self, x):
        y = self.conv(x)
        return x + y if self.use_skip else y


class _TorchMobileNetV2(tnn.Module):
    _SETTINGS = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                 (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    def __init__(self, embed_dim=512):
        super().__init__()
        feats = [tnn.Sequential(tnn.Conv2d(3, 32, 3, 2, 1, bias=False),
                                tnn.BatchNorm2d(32), tnn.ReLU6())]
        in_c = 32
        for t, c, n, s in self._SETTINGS:
            for j in range(n):
                feats.append(_TorchInvertedResidual(
                    in_c, c, s if j == 0 else 1, t))
                in_c = c
        feats.append(tnn.Sequential(tnn.Conv2d(in_c, 1280, 1, bias=False),
                                    tnn.BatchNorm2d(1280), tnn.ReLU6()))
        self.features = tnn.Sequential(*feats)
        self.classifier = tnn.Sequential(tnn.Dropout(0.2),
                                         tnn.Linear(1280, embed_dim))

    def forward(self, x):
        x = self.features(x).mean(dim=(2, 3))
        return self.classifier(x)


class _TorchSqueezeExcite(tnn.Module):
    def __init__(self, hid, squeeze):
        super().__init__()
        self.fc1 = tnn.Conv2d(hid, squeeze, 1)
        self.fc2 = tnn.Conv2d(squeeze, hid, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = torch.nn.functional.silu(self.fc1(s))
        return x * torch.sigmoid(self.fc2(s))


class _TorchMBConv(tnn.Module):
    def __init__(self, in_c, out_c, stride, t, k):
        super().__init__()
        hid = in_c * t
        self.use_skip = stride == 1 and in_c == out_c
        layers = []
        if t != 1:
            layers.append(tnn.Sequential(
                tnn.Conv2d(in_c, hid, 1, bias=False), tnn.BatchNorm2d(hid),
                tnn.SiLU()))
        layers.append(tnn.Sequential(
            tnn.Conv2d(hid, hid, k, stride, k // 2, groups=hid, bias=False),
            tnn.BatchNorm2d(hid), tnn.SiLU()))
        layers.append(_TorchSqueezeExcite(hid, max(1, in_c // 4)))
        layers.append(tnn.Sequential(tnn.Conv2d(hid, out_c, 1, bias=False),
                                     tnn.BatchNorm2d(out_c)))
        self.block = tnn.Sequential(*layers)

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_skip else y  # eval: no stochastic depth


class _TorchEfficientNetB0(tnn.Module):
    _SETTINGS = ((1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
                 (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
                 (6, 320, 1, 1, 3))

    def __init__(self, embed_dim=512):
        super().__init__()
        feats = [tnn.Sequential(tnn.Conv2d(3, 32, 3, 2, 1, bias=False),
                                tnn.BatchNorm2d(32), tnn.SiLU())]
        in_c = 32
        for t, c, n, s, k in self._SETTINGS:
            stage = []
            for j in range(n):
                stage.append(_TorchMBConv(in_c, c, s if j == 0 else 1, t, k))
                in_c = c
            feats.append(tnn.Sequential(*stage))
        feats.append(tnn.Sequential(tnn.Conv2d(in_c, 1280, 1, bias=False),
                                    tnn.BatchNorm2d(1280), tnn.SiLU()))
        self.features = tnn.Sequential(*feats)
        self.classifier = tnn.Sequential(tnn.Dropout(0.2),
                                         tnn.Linear(1280, embed_dim))

    def forward(self, x):
        x = self.features(x).mean(dim=(2, 3))
        return self.classifier(x)


@pytest.mark.parametrize("name,cls", [
    pytest.param("mobilenet_v2", _TorchMobileNetV2,
                 marks=pytest.mark.slow),
    pytest.param("efficientnet_b0", _TorchEfficientNetB0,
                 marks=pytest.mark.slow)])
def test_port_matches_torch_golden_activations_mobile(name, cls):
    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.utils.torch_port import (
        port_torchvision_efficientnet_b0,
        port_torchvision_mobilenet_v2,
    )

    tmodel = _randomize(cls(), seed=11).eval()
    rs = np.random.RandomState(1)
    x = rs.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x)).numpy()

    jmodel = get_backbone(name, dtype=jnp.float32)
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), train=False)
    porter = (port_torchvision_mobilenet_v2 if name == "mobilenet_v2"
              else port_torchvision_efficientnet_b0)
    params, stats = porter(tmodel.state_dict(), variables)

    with jax.default_matmul_precision("float32"):
        out = jmodel.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(out), golden, rtol=2e-3,
                               atol=2e-4 * float(np.abs(golden).max()))


def test_cli_train_with_pretrained(tmp_path):
    """End-to-end: `face train --pretrained <pth> --synthetic` trains and the
    initial backbone weights are the ported ones."""
    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.train.optim import get_optimizer
    from face_recognition_models_tpu.train.state import create_train_state

    tmodel = _randomize(_TorchResNet(_BasicBlock, (2, 2, 2, 2)), seed=5)
    path = tmp_path / "r18.pth"
    torch.save(tmodel.state_dict(), path)

    cfg = cfg_lib.TrainConfig(
        backbone="resnet18", head="arcface", num_classes=8,
        pretrained_path=str(path),
        data=cfg_lib.DataConfig(image_size=32))
    head_cfg = cfg_lib.make_head_config("arcface", num_classes=8)
    tx = get_optimizer("sgd", 0.1)
    _, _, state = create_train_state(cfg, head_cfg, tx)
    np.testing.assert_allclose(
        np.asarray(state.params["backbone"]["conv1"]["kernel"]),
        tmodel.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["bn1"]["mean"]),
        tmodel.state_dict()["bn1.running_mean"].numpy(), rtol=1e-6)
