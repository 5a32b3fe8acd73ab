"""iResNet backbone family (models/iresnet.py) — the insightface/ArcFace
production trunk, beyond-reference.

Golden-activation validation mirrors tests/test_pretrained_port.py: an
in-test plain-torch replica of the arcface_torch iresnet graph (state_dict
key-compatible) with randomized weights AND BN running stats produces
golden outputs; `port_iresnet` maps its state_dict onto the Flax model and
the fp32 outputs must agree. This pins everything the port can get wrong:
BN-first block order, per-channel PReLU, stride-2-on-every-stage geometry,
the NCHW->NHWC fc flatten permutation, and the frozen-scale feature BN.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class _TIBasicBlock(tnn.Module):
    def __init__(self, in_c, planes, stride):
        super().__init__()
        self.bn1 = tnn.BatchNorm2d(in_c, eps=1e-05)
        self.conv1 = tnn.Conv2d(in_c, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes, eps=1e-05)
        self.prelu = tnn.PReLU(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes, eps=1e-05)
        self.downsample = None
        if stride != 1 or in_c != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_c, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes, eps=1e-05))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.bn1(x)
        y = self.conv1(y)
        y = self.prelu(self.bn2(y))
        y = self.conv2(y)
        y = self.bn3(y)
        return y + idt


class _TorchIResNet(tnn.Module):
    def __init__(self, stage_sizes, image_size, embed_dim=512):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64, eps=1e-05)
        self.prelu = tnn.PReLU(64)
        in_c = 64
        for i, blocks in enumerate(stage_sizes):
            planes = 64 * 2 ** i
            layers = []
            for j in range(blocks):
                layers.append(_TIBasicBlock(in_c, planes,
                                            2 if j == 0 else 1))
                in_c = planes
            setattr(self, f"layer{i + 1}", tnn.Sequential(*layers))
        self.bn2 = tnn.BatchNorm2d(in_c, eps=1e-05)
        side = image_size // 2 ** len(stage_sizes)
        self.fc = tnn.Linear(in_c * side * side, embed_dim)
        self.features = tnn.BatchNorm1d(embed_dim, eps=1e-05)
        tnn.init.constant_(self.features.weight, 1.0)
        self.features.weight.requires_grad = False

    def forward(self, x):
        x = self.prelu(self.bn1(self.conv1(x)))
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        x = self.bn2(x)
        x = torch.flatten(x, 1)
        x = self.fc(x)
        return self.features(x)


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if not v.dtype.is_floating_point:
            continue
        if k == "features.weight":
            continue  # frozen at 1 (insightface convention)
        if k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=g)
        elif "weight" in k and v.ndim == 1:  # BN scale / PReLU slope
            sd[k] = 0.5 + torch.rand(v.shape, generator=g)
        else:
            sd[k] = 0.1 * torch.randn(v.shape, generator=g)
    model.load_state_dict(sd)
    return model


def test_port_matches_torch_golden_activations():
    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.utils.torch_port import port_iresnet

    stages = (2, 2, 2, 2)
    tmodel = _randomize(_TorchIResNet(stages, image_size=64), seed=11).eval()
    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x)).numpy()

    jmodel = get_backbone("iresnet18", dtype=jnp.float32)
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), train=False)
    params, stats = port_iresnet(tmodel.state_dict(), variables, stages)

    with jax.default_matmul_precision("float32"):
        out = jmodel.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(out), golden, rtol=2e-3,
                               atol=2e-4 * float(np.abs(golden).max()))


def test_port_rejects_unfrozen_feature_scale():
    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.utils.torch_port import port_iresnet

    stages = (2, 2, 2, 2)
    tmodel = _TorchIResNet(stages, image_size=32)
    tmodel.features.weight.data.fill_(2.0)
    jmodel = get_backbone("iresnet18", dtype=jnp.float32)
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)), train=False)
    with pytest.raises(ValueError, match="frozen at 1"):
        port_iresnet(tmodel.state_dict(), variables, stages)


def test_port_rejects_fc_shape_mismatch():
    """A checkpoint built at a different image size must raise, not
    silently leave the embedding fc at its random init (the iresnet fc
    IS the embedding layer, unlike torchvision classifiers)."""
    from face_recognition_models_tpu.models import get_backbone
    from face_recognition_models_tpu.utils.torch_port import port_iresnet

    stages = (2, 2, 2, 2)
    tmodel = _TorchIResNet(stages, image_size=64)  # fc in = 4*4*512
    jmodel = get_backbone("iresnet18", dtype=jnp.float32)
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)),  # fc in = 2*2*512
                            train=False)
    with pytest.raises(ValueError, match="fc shape mismatch"):
        port_iresnet(tmodel.state_dict(), variables, stages)


def test_forward_shape_and_nchw_rejection():
    from face_recognition_models_tpu.models import get_backbone

    model = get_backbone("iresnet18", embed_dim=256)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    out = model.apply(v, jnp.zeros((2, 32, 32, 3)), train=False)
    assert out.shape == (2, 256)
    assert out.dtype == jnp.float32  # feature BN emits fp32 embeddings

    with pytest.raises(ValueError, match="NHWC"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)),
                   train=False)


def test_bf16_compute_fp32_params():
    from face_recognition_models_tpu.models import get_backbone

    model = get_backbone("iresnet18")  # default bf16
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(v["params"]))
    out = model.apply(v, jnp.zeros((2, 32, 32, 3)), train=False)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_train_smoke_loss_decreases():
    """fit() a tiny iresnet18 — the BN-heavy block order, PReLU backward,
    and feature-BN train mode all run through the production step."""
    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.data.pipeline import ArrayLoader
    from face_recognition_models_tpu.data.synthetic import (
        synthetic_identities)
    from face_recognition_models_tpu.train.loop import fit

    C, PER, BS = 4, 8, 16
    images, labels = synthetic_identities(C, PER, image_size=32, seed=0,
                                          noise=10.0)
    loader = ArrayLoader(images, labels, batch_size=BS, seed=0)
    cfg = cfg_lib.TrainConfig(
        backbone="iresnet18", head="arcface", num_classes=C, batch_size=BS,
        epochs=6, seed=0, data=cfg_lib.DataConfig(image_size=32),
        optimizer=cfg_lib.OptimizerConfig(learning_rate=0.02))
    losses = []
    r = fit(cfg, loader, use_mesh=False,
            hooks=lambda epoch, state, train_loss: losses.append(train_loss))
    assert np.isfinite(r.min_train_loss)
    assert losses[-1] < losses[0]
