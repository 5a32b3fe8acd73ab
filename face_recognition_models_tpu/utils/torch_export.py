"""Export trained Flax backbones as torch state_dicts (the reverse port).

`utils/torch_port.py` brings torch weights IN (the reference's
ImageNet-pretrained init, backbones.py:12-26); this module takes trained
weights back OUT, producing a state_dict in the exact torchvision /
insightface-arcface_torch key layout so the torch ecosystem (the reference
included) can consume models trained here. Every exporter is the strict
inverse of its forward porter: the round-trip tests in
tests/test_torch_export.py port an exported dict back onto a *differently*
initialized model and require exact tree equality, so a missed leaf or a
wrong transpose cannot pass.

All values are returned as float32 numpy arrays (plus int64
`num_batches_tracked` zeros so `torch.nn.Module.load_state_dict(strict=True)`
accepts the result); the CLI boundary converts to torch tensors.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _f32(x):
    return np.asarray(x, dtype=np.float32)


def _conv_out(kernel):
    # flax conv kernel [H, W, I, O] -> torch [O, I, H, W]
    return _f32(kernel).transpose(3, 2, 0, 1)


def _bn_out(sd: Dict, prefix: str, p_bn: Dict, s_bn: Dict) -> None:
    sd[prefix + ".weight"] = _f32(p_bn["scale"])
    sd[prefix + ".bias"] = _f32(p_bn["bias"])
    sd[prefix + ".running_mean"] = _f32(s_bn["mean"])
    sd[prefix + ".running_var"] = _f32(s_bn["var"])
    sd[prefix + ".num_batches_tracked"] = np.zeros((), dtype=np.int64)


def _linear_out(sd: Dict, prefix: str, p_fc: Dict) -> None:
    sd[prefix + ".weight"] = _f32(p_fc["kernel"]).T  # [in, out] -> [out, in]
    sd[prefix + ".bias"] = _f32(p_fc["bias"])


def _host(tree):
    import jax

    return jax.tree.map(np.asarray, jax.device_get(tree))


def export_resnet_state_dict(params: Dict, batch_stats: Dict,
                             stage_sizes: Tuple[int, ...]) -> Dict:
    """models/resnet.py variables -> torchvision-v1.5 ResNet state_dict.

    Inverse of `port_torchvision_resnet` (both basic-block and bottleneck
    variants; the block kind is read off the param tree).
    """
    params, stats = _host(params), _host(batch_stats)
    sd: Dict = {}
    sd["conv1.weight"] = _conv_out(params["conv1"]["kernel"])
    _bn_out(sd, "bn1", params["bn1"], stats["bn1"])

    n_convs = 3 if "conv3" in params["layer1_0"] else 2
    for stage, blocks in enumerate(stage_sizes, start=1):
        for b in range(blocks):
            src = f"layer{stage}_{b}"
            dst = f"layer{stage}.{b}"
            p, s = params[src], stats[src]
            for ci in range(1, n_convs + 1):
                sd[f"{dst}.conv{ci}.weight"] = _conv_out(
                    p[f"conv{ci}"]["kernel"])
                _bn_out(sd, f"{dst}.bn{ci}", p[f"bn{ci}"], s[f"bn{ci}"])
            if "downsample_conv" in p:
                sd[f"{dst}.downsample.0.weight"] = _conv_out(
                    p["downsample_conv"]["kernel"])
                _bn_out(sd, f"{dst}.downsample.1", p["downsample_bn"],
                        s["downsample_bn"])

    _linear_out(sd, "fc", params["fc"])
    return sd


def export_mobilenet_v2_state_dict(params: Dict, batch_stats: Dict) -> Dict:
    """models/mobilenet.py variables -> torchvision mobilenet_v2 state_dict.

    Inverse of `port_torchvision_mobilenet_v2` (features.0 stem CNA,
    features.1..17 InvertedResidual `.conv` sequentials, features.18 head
    CNA, classifier.1 Linear — the 512-d embedding exported in place of the
    ImageNet classifier, as the reference swaps it, backbones.py:24-26).
    """
    from face_recognition_models_tpu.models.mobilenet import _MBV2_SETTINGS

    params, stats = _host(params), _host(batch_stats)
    sd: Dict = {}
    sd["features.0.0.weight"] = _conv_out(params["stem"]["kernel"])
    _bn_out(sd, "features.0.1", params["stem_bn"], stats["stem_bn"])

    feat = 1
    for i, (t, _ch, n, _s) in enumerate(_MBV2_SETTINGS):
        for j in range(n):
            dst = f"features.{feat}.conv"
            p, s = params[f"block{i}_{j}"], stats[f"block{i}_{j}"]
            k = 0
            if t != 1:
                sd[f"{dst}.{k}.0.weight"] = _conv_out(p["expand"]["kernel"])
                _bn_out(sd, f"{dst}.{k}.1", p["expand_bn"], s["expand_bn"])
                k += 1
            sd[f"{dst}.{k}.0.weight"] = _conv_out(p["depthwise"]["kernel"])
            _bn_out(sd, f"{dst}.{k}.1", p["depthwise_bn"], s["depthwise_bn"])
            sd[f"{dst}.{k + 1}.weight"] = _conv_out(p["project"]["kernel"])
            _bn_out(sd, f"{dst}.{k + 2}", p["project_bn"], s["project_bn"])
            feat += 1

    sd[f"features.{feat}.0.weight"] = _conv_out(params["head"]["kernel"])
    _bn_out(sd, f"features.{feat}.1", params["head_bn"], stats["head_bn"])
    _linear_out(sd, "classifier.1", params["fc"])
    return sd


def export_efficientnet_b0_state_dict(params: Dict,
                                      batch_stats: Dict) -> Dict:
    """models/efficientnet.py variables -> torchvision efficientnet_b0
    state_dict. Inverse of `port_torchvision_efficientnet_b0`."""
    from face_recognition_models_tpu.models.efficientnet import _B0_SETTINGS

    params, stats = _host(params), _host(batch_stats)
    sd: Dict = {}
    sd["features.0.0.weight"] = _conv_out(params["stem"]["kernel"])
    _bn_out(sd, "features.0.1", params["stem_bn"], stats["stem_bn"])

    for i, (t, _ch, n, _s, _k) in enumerate(_B0_SETTINGS):
        for j in range(n):
            dst = f"features.{i + 1}.{j}.block"
            p, s = params[f"block{i}_{j}"], stats[f"block{i}_{j}"]
            k = 0
            if t != 1:
                sd[f"{dst}.{k}.0.weight"] = _conv_out(p["expand"]["kernel"])
                _bn_out(sd, f"{dst}.{k}.1", p["expand_bn"], s["expand_bn"])
                k += 1
            sd[f"{dst}.{k}.0.weight"] = _conv_out(p["depthwise"]["kernel"])
            _bn_out(sd, f"{dst}.{k}.1", p["depthwise_bn"], s["depthwise_bn"])
            sd[f"{dst}.{k + 1}.fc1.weight"] = _conv_out(
                p["se"]["reduce"]["kernel"])
            sd[f"{dst}.{k + 1}.fc1.bias"] = _f32(p["se"]["reduce"]["bias"])
            sd[f"{dst}.{k + 1}.fc2.weight"] = _conv_out(
                p["se"]["expand"]["kernel"])
            sd[f"{dst}.{k + 1}.fc2.bias"] = _f32(p["se"]["expand"]["bias"])
            sd[f"{dst}.{k + 2}.0.weight"] = _conv_out(p["project"]["kernel"])
            _bn_out(sd, f"{dst}.{k + 2}.1", p["project_bn"], s["project_bn"])

    sd["features.8.0.weight"] = _conv_out(params["head"]["kernel"])
    _bn_out(sd, "features.8.1", params["head_bn"], stats["head_bn"])
    _linear_out(sd, "classifier.1", params["fc"])
    return sd


def export_iresnet_state_dict(params: Dict, batch_stats: Dict,
                              stage_sizes: Tuple[int, ...]) -> Dict:
    """models/iresnet.py variables -> insightface arcface_torch iresnet
    state_dict. Inverse of `port_iresnet`, including the NHWC->NCHW fc
    flatten permutation and the frozen `features.weight = 1` BatchNorm1d
    scale insightface ships.
    """
    params, stats = _host(params), _host(batch_stats)
    sd: Dict = {}
    sd["conv1.weight"] = _conv_out(params["conv1"]["kernel"])
    _bn_out(sd, "bn1", params["bn1"], stats["bn1"])
    sd["prelu.weight"] = _f32(params["prelu"]["alpha"])

    for stage, blocks in enumerate(stage_sizes, start=1):
        for b in range(blocks):
            src = f"layer{stage}_{b}"
            dst = f"layer{stage}.{b}"
            p, s = params[src], stats[src]
            _bn_out(sd, f"{dst}.bn1", p["bn1"], s["bn1"])
            sd[f"{dst}.conv1.weight"] = _conv_out(p["conv1"]["kernel"])
            _bn_out(sd, f"{dst}.bn2", p["bn2"], s["bn2"])
            sd[f"{dst}.prelu.weight"] = _f32(p["prelu"]["alpha"])
            sd[f"{dst}.conv2.weight"] = _conv_out(p["conv2"]["kernel"])
            _bn_out(sd, f"{dst}.bn3", p["bn3"], s["bn3"])
            if "downsample_conv" in p:
                sd[f"{dst}.downsample.0.weight"] = _conv_out(
                    p["downsample_conv"]["kernel"])
                _bn_out(sd, f"{dst}.downsample.1", p["downsample_bn"],
                        s["downsample_bn"])

    _bn_out(sd, "bn2", params["bn2"], stats["bn2"])

    # fc: flax [H*W*C, D] (NHWC flatten) -> torch [D, C*H*W] (NCHW flatten)
    k = _f32(params["fc"]["kernel"])
    in_dim, d_out = k.shape
    c = 64 * 2 ** (len(stage_sizes) - 1)
    h = int(round((in_dim // c) ** 0.5))
    sd["fc.weight"] = (k.reshape(h, h, c, d_out).transpose(3, 2, 0, 1)
                       .reshape(d_out, in_dim))
    sd["fc.bias"] = _f32(params["fc"]["bias"])

    sd["features.weight"] = np.ones_like(_f32(params["features"]["bias"]))
    sd["features.bias"] = _f32(params["features"]["bias"])
    sd["features.running_mean"] = _f32(stats["features"]["mean"])
    sd["features.running_var"] = _f32(stats["features"]["var"])
    sd["features.num_batches_tracked"] = np.zeros((), dtype=np.int64)
    return sd


def export_torch_state_dict(backbone_name: str, params: Dict,
                            batch_stats: Dict) -> Dict:
    """Dispatch `face export --format torch` by backbone name.

    Returns {torch_key: np.ndarray}; callers wrap values in torch tensors
    (`torch.save({k: torch.from_numpy(v) ...})`) so this module stays
    importable without torch.
    """
    from face_recognition_models_tpu.utils.torch_port import (
        _IRESNET_STAGES, _RESNET_STAGES)

    name = backbone_name.lower()
    if name in _RESNET_STAGES:
        return export_resnet_state_dict(params, batch_stats,
                                        _RESNET_STAGES[name])
    if name in _IRESNET_STAGES:
        return export_iresnet_state_dict(params, batch_stats,
                                         _IRESNET_STAGES[name])
    if name == "mobilenet_v2":
        return export_mobilenet_v2_state_dict(params, batch_stats)
    if name == "efficientnet_b0":
        return export_efficientnet_b0_state_dict(params, batch_stats)
    raise ValueError(
        f"--format torch supports {sorted(_RESNET_STAGES) + sorted(_IRESNET_STAGES) + ['efficientnet_b0', 'mobilenet_v2']}; "
        f"got '{backbone_name}'")
