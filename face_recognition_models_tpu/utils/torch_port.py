"""Port torchvision checkpoints into this framework's Flax params.

The reference initializes its backbones from ImageNet-pretrained
torchvision weights (backbones.py:12-26). This environment has no download
egress, so pretrained init is delivered as a converter: load a torchvision
`state_dict` (resnet18/resnet50/efficientnet_b0/mobilenet_v2) from disk and
map it onto the Flax param/batch-stats pytree (NCHW->NHWC kernel transposes
included).

Usage:
    import torch
    sd = torch.load("resnet50-imagenet.pth", map_location="cpu")
    params, batch_stats = port_torchvision_resnet(sd, flax_variables,
                                                  stage_sizes=(3, 4, 6, 3))

The final `fc` layer is NOT ported when the output dim differs (the
reference swaps it for a fresh 512-d embedding layer anyway).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv(sd, key):
    # torch conv kernel [O, I, H, W] -> flax [H, W, I, O]
    return _np(sd[key]).transpose(2, 3, 1, 0)


def _bn(sd, prefix):
    return {
        "scale": _np(sd[prefix + ".weight"]),
        "bias": _np(sd[prefix + ".bias"]),
        "mean": _np(sd[prefix + ".running_mean"]),
        "var": _np(sd[prefix + ".running_var"]),
    }


def port_torchvision_resnet(state_dict: Dict, variables: Dict,
                            stage_sizes: Tuple[int, ...],
                            bottleneck: bool = None,
                            port_fc: bool = False) -> Tuple[Dict, Dict]:
    """Map a torchvision ResNet state_dict onto our ResNet variables.

    Returns (params, batch_stats) as plain nested dicts congruent with
    `variables['params']` / `variables['batch_stats']`.
    """
    import jax

    params = jax.tree.map(np.asarray, jax.device_get(variables["params"]))
    stats = jax.tree.map(np.asarray, jax.device_get(variables["batch_stats"]))
    if bottleneck is None:
        bottleneck = any("conv3" in k for k in state_dict)

    def set_bn(dst_params, dst_stats, name, src):
        dst_params[name] = {"scale": src["scale"], "bias": src["bias"]}
        dst_stats[name] = {"mean": src["mean"], "var": src["var"]}

    # stem
    params["conv1"] = {"kernel": _conv(state_dict, "conv1.weight")}
    set_bn(params, stats, "bn1", _bn(state_dict, "bn1"))

    n_convs = 3 if bottleneck else 2
    for stage, blocks in enumerate(stage_sizes, start=1):
        for b in range(blocks):
            src = f"layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            p, s = params[dst], stats[dst]
            for ci in range(1, n_convs + 1):
                p[f"conv{ci}"] = {"kernel": _conv(state_dict,
                                                  f"{src}.conv{ci}.weight")}
                set_bn(p, s, f"bn{ci}", _bn(state_dict, f"{src}.bn{ci}"))
            if f"{src}.downsample.0.weight" in state_dict:
                p["downsample_conv"] = {
                    "kernel": _conv(state_dict, f"{src}.downsample.0.weight")}
                set_bn(p, s, "downsample_bn",
                       _bn(state_dict, f"{src}.downsample.1"))

    if port_fc and "fc.weight" in state_dict:
        w = _np(state_dict["fc.weight"])  # [out, in]
        if w.shape[0] == params["fc"]["kernel"].shape[1]:
            params["fc"] = {"kernel": w.T,
                            "bias": _np(state_dict["fc.bias"])}

    _check_congruent(variables["params"], params, "params")
    _check_congruent(variables["batch_stats"], stats, "batch_stats")
    return params, stats


def _set_bn(dst_params, dst_stats, name, src):
    dst_params[name] = {"scale": src["scale"], "bias": src["bias"]}
    dst_stats[name] = {"mean": src["mean"], "var": src["var"]}


def _linear_port(state_dict, params, src, dst_params):
    """Port a torch Linear onto a flax Dense iff the out-dims match."""
    if src + ".weight" not in state_dict:
        return
    w = _np(state_dict[src + ".weight"])  # [out, in]
    if w.shape[0] == dst_params["kernel"].shape[1]:
        dst_params["kernel"] = w.T
        dst_params["bias"] = _np(state_dict[src + ".bias"])


def port_torchvision_mobilenet_v2(state_dict: Dict, variables: Dict
                                  ) -> Tuple[Dict, Dict]:
    """Map a torchvision mobilenet_v2 state_dict onto our MobileNetV2.

    torchvision layout (models/mobilenetv2.py): features.0 = stem
    Conv2dNormActivation; features.1..17 = InvertedResidual whose `.conv`
    sequential is [expand CNA,] depthwise CNA, project conv, project bn
    (the expand stage is absent when expand_ratio == 1); features.18 =
    head CNA; classifier.1 = Linear. The reference swaps classifier[1]
    for a 512-d embedding (backbones.py:24-26).
    """
    import jax

    from face_recognition_models_tpu.models.mobilenet import _MBV2_SETTINGS

    params = jax.tree.map(np.asarray, jax.device_get(variables["params"]))
    stats = jax.tree.map(np.asarray, jax.device_get(variables["batch_stats"]))

    params["stem"] = {"kernel": _conv(state_dict, "features.0.0.weight")}
    _set_bn(params, stats, "stem_bn", _bn(state_dict, "features.0.1"))

    feat = 1
    for i, (t, _ch, n, _s) in enumerate(_MBV2_SETTINGS):
        for j in range(n):
            src = f"features.{feat}.conv"
            p, s = params[f"block{i}_{j}"], stats[f"block{i}_{j}"]
            k = 0
            if t != 1:
                p["expand"] = {"kernel": _conv(state_dict,
                                               f"{src}.{k}.0.weight")}
                _set_bn(p, s, "expand_bn", _bn(state_dict, f"{src}.{k}.1"))
                k += 1
            p["depthwise"] = {"kernel": _conv(state_dict,
                                              f"{src}.{k}.0.weight")}
            _set_bn(p, s, "depthwise_bn", _bn(state_dict, f"{src}.{k}.1"))
            p["project"] = {"kernel": _conv(state_dict,
                                            f"{src}.{k + 1}.weight")}
            _set_bn(p, s, "project_bn", _bn(state_dict, f"{src}.{k + 2}"))
            feat += 1

    params["head"] = {"kernel": _conv(state_dict, f"features.{feat}.0.weight")}
    _set_bn(params, stats, "head_bn", _bn(state_dict, f"features.{feat}.1"))
    _linear_port(state_dict, params, "classifier.1", params["fc"])

    _check_congruent(variables["params"], params, "params")
    _check_congruent(variables["batch_stats"], stats, "batch_stats")
    return params, stats


def port_torchvision_efficientnet_b0(state_dict: Dict, variables: Dict
                                     ) -> Tuple[Dict, Dict]:
    """Map a torchvision efficientnet_b0 state_dict onto our EfficientNetB0.

    torchvision layout (models/efficientnet.py): features.0 = stem CNA;
    features.1..7 = stages of MBConv whose `.block` sequential is
    [expand CNA,] depthwise CNA, SqueezeExcitation(fc1/fc2), project CNA
    (expand absent when expand_ratio == 1); features.8 = head CNA;
    classifier.1 = Linear (the reference swaps it, backbones.py:20-22).
    """
    import jax

    from face_recognition_models_tpu.models.efficientnet import _B0_SETTINGS

    params = jax.tree.map(np.asarray, jax.device_get(variables["params"]))
    stats = jax.tree.map(np.asarray, jax.device_get(variables["batch_stats"]))

    params["stem"] = {"kernel": _conv(state_dict, "features.0.0.weight")}
    _set_bn(params, stats, "stem_bn", _bn(state_dict, "features.0.1"))

    for i, (t, _ch, n, _s, _k) in enumerate(_B0_SETTINGS):
        for j in range(n):
            src = f"features.{i + 1}.{j}.block"
            p, s = params[f"block{i}_{j}"], stats[f"block{i}_{j}"]
            k = 0
            if t != 1:
                p["expand"] = {"kernel": _conv(state_dict,
                                               f"{src}.{k}.0.weight")}
                _set_bn(p, s, "expand_bn", _bn(state_dict, f"{src}.{k}.1"))
                k += 1
            p["depthwise"] = {"kernel": _conv(state_dict,
                                              f"{src}.{k}.0.weight")}
            _set_bn(p, s, "depthwise_bn", _bn(state_dict, f"{src}.{k}.1"))
            p["se"] = {
                "reduce": {"kernel": _conv(state_dict,
                                           f"{src}.{k + 1}.fc1.weight"),
                           "bias": _np(state_dict[f"{src}.{k + 1}.fc1.bias"])},
                "expand": {"kernel": _conv(state_dict,
                                           f"{src}.{k + 1}.fc2.weight"),
                           "bias": _np(state_dict[f"{src}.{k + 1}.fc2.bias"])},
            }
            p["project"] = {"kernel": _conv(state_dict,
                                            f"{src}.{k + 2}.0.weight")}
            _set_bn(p, s, "project_bn", _bn(state_dict, f"{src}.{k + 2}.1"))

    params["head"] = {"kernel": _conv(state_dict, "features.8.0.weight")}
    _set_bn(params, stats, "head_bn", _bn(state_dict, "features.8.1"))
    _linear_port(state_dict, params, "classifier.1", params["fc"])

    _check_congruent(variables["params"], params, "params")
    _check_congruent(variables["batch_stats"], stats, "batch_stats")
    return params, stats


_RESNET_STAGES = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3)}
_IRESNET_STAGES = {"iresnet18": (2, 2, 2, 2), "iresnet50": (3, 4, 14, 3),
                   "iresnet100": (3, 13, 30, 5)}
_PORTERS = ("resnet18", "resnet50", "efficientnet_b0", "mobilenet_v2",
            "iresnet18", "iresnet50", "iresnet100")


def load_pretrained_backbone(path: str, backbone_name: str, variables: Dict
                             ) -> Tuple[Dict, Dict]:
    """Load a torch `state_dict` file and port it onto `variables`.

    This is the `face train --pretrained <file.pth>` entry point, the
    equivalent of the reference's ImageNet-pretrained init
    (backbones.py:12-26) for all four reference backbones. Accepts either a
    bare state_dict or a checkpoint dict wrapping one under
    'state_dict'/'model'. The embedding `fc` layer is only ported when its
    output dim matches (torchvision classifiers don't; the reference swaps
    them for a fresh 512-d layer too).
    """
    name = backbone_name.lower()
    if name not in _PORTERS:
        raise ValueError(
            f"--pretrained supports {sorted(_PORTERS)}; got "
            f"'{backbone_name}'")
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    for wrapper in ("state_dict", "model"):
        if isinstance(sd, dict) and wrapper in sd and not hasattr(
                sd[wrapper], "shape"):
            sd = sd[wrapper]
    if name == "efficientnet_b0":
        return port_torchvision_efficientnet_b0(sd, variables)
    if name in _IRESNET_STAGES:
        return port_iresnet(sd, variables, _IRESNET_STAGES[name])
    if name == "mobilenet_v2":
        return port_torchvision_mobilenet_v2(sd, variables)
    return port_torchvision_resnet(sd, variables, _RESNET_STAGES[name],
                                   port_fc=True)


def _check_congruent(ref, got, what):
    import jax

    ref_shapes = jax.tree.map(lambda x: tuple(x.shape), ref)
    got_shapes = jax.tree.map(lambda x: tuple(x.shape), got)
    if ref_shapes != got_shapes:
        raise ValueError(f"ported {what} tree does not match the model: "
                         f"expected {ref_shapes}, got {got_shapes}")


def port_iresnet(state_dict: Dict, variables: Dict,
                 stage_sizes: Tuple[int, ...]) -> Tuple[Dict, Dict]:
    """Map an insightface iresnet state_dict (arcface_torch layout:
    conv1/bn1/prelu, layerL.B.{bn1,conv1,bn2,prelu,conv2,bn3,downsample},
    bn2, fc, features) onto models/iresnet.py variables.

    The fc flatten order differs (torch flattens NCHW -> C*H*W, flax
    flattens NHWC -> H*W*C): the fc kernel is permuted accordingly. The
    `features` BatchNorm1d scale is frozen at 1 in insightface and our
    module has use_scale=False — the torch weight is checked ~1 and
    dropped.
    """
    import jax

    params = jax.tree.map(np.asarray, jax.device_get(variables["params"]))
    stats = jax.tree.map(np.asarray, jax.device_get(variables["batch_stats"]))

    params["conv1"] = {"kernel": _conv(state_dict, "conv1.weight")}
    _set_bn(params, stats, "bn1", _bn(state_dict, "bn1"))
    params["prelu"] = {"alpha": _np(state_dict["prelu.weight"])}

    for stage, blocks in enumerate(stage_sizes, start=1):
        for b in range(blocks):
            src = f"layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            p, s = params[dst], stats[dst]
            _set_bn(p, s, "bn1", _bn(state_dict, f"{src}.bn1"))
            p["conv1"] = {"kernel": _conv(state_dict, f"{src}.conv1.weight")}
            _set_bn(p, s, "bn2", _bn(state_dict, f"{src}.bn2"))
            p["prelu"] = {"alpha": _np(state_dict[f"{src}.prelu.weight"])}
            p["conv2"] = {"kernel": _conv(state_dict, f"{src}.conv2.weight")}
            _set_bn(p, s, "bn3", _bn(state_dict, f"{src}.bn3"))
            if f"{src}.downsample.0.weight" in state_dict:
                p["downsample_conv"] = {
                    "kernel": _conv(state_dict, f"{src}.downsample.0.weight")}
                _set_bn(p, s, "downsample_bn",
                        _bn(state_dict, f"{src}.downsample.1"))

    _set_bn(params, stats, "bn2", _bn(state_dict, "bn2"))

    # fc: torch [D, C*H*W] -> flax [H*W*C, D]
    w = _np(state_dict["fc.weight"])
    d_out, in_dim = w.shape
    if (in_dim, d_out) != tuple(params["fc"]["kernel"].shape):
        # Unlike torchvision classifiers (deliberately skipped when the
        # reference swaps them for a fresh embedding), the iresnet fc IS
        # the embedding layer — a shape mismatch means the model was
        # built at a different image size than the checkpoint and the
        # port would silently ship a random fc.
        raise ValueError(
            f"iresnet fc shape mismatch: checkpoint [{d_out}, {in_dim}] "
            f"vs model {tuple(params['fc']['kernel'].shape)} — build the "
            "model at the checkpoint's image size (112 for insightface)")
    c = 64 * 2 ** (len(stage_sizes) - 1)
    hw = in_dim // c
    h = int(round(hw ** 0.5))
    params["fc"] = {
        "kernel": w.reshape(d_out, c, h, h).transpose(2, 3, 1, 0)
        .reshape(in_dim, d_out),
        "bias": _np(state_dict["fc.bias"]),
    }

    fw = _np(state_dict["features.weight"])
    if not np.allclose(fw, 1.0, atol=1e-3):
        raise ValueError(
            "features BatchNorm1d scale is not frozen at 1 "
            f"(max dev {np.max(np.abs(fw - 1.0)):.3e}); models/iresnet.py "
            "uses use_scale=False and cannot represent it")
    params["features"] = {"bias": _np(state_dict["features.bias"])}
    stats["features"] = {"mean": _np(state_dict["features.running_mean"]),
                         "var": _np(state_dict["features.running_var"])}

    _check_congruent(variables["params"], params, "params")
    _check_congruent(variables["batch_stats"], stats, "batch_stats")
    return params, stats
