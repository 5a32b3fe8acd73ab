"""Auxiliary components: torch-port converter, standalone triplet losses,
LFW triplet parsing, debug helper, profiling timer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_recognition_models_tpu.models.resnet import resnet18, resnet50


def _fake_torch_resnet_sd(stage_sizes, bottleneck, width=64):
    """Build a minimal torch-layout state_dict with random values using the
    actual torch ResNet so shapes are authentic."""
    import torch

    sd = {}
    rs = np.random.RandomState(0)

    def conv(o, i, k):
        return torch.tensor(rs.randn(o, i, k, k).astype(np.float32))

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.tensor(rs.rand(c).astype(np.float32))
        sd[f"{prefix}.bias"] = torch.tensor(rs.randn(c).astype(np.float32))
        sd[f"{prefix}.running_mean"] = torch.tensor(
            rs.randn(c).astype(np.float32))
        sd[f"{prefix}.running_var"] = torch.tensor(
            rs.rand(c).astype(np.float32) + 0.5)

    sd["conv1.weight"] = conv(width, 3, 7)
    bn("bn1", width)
    in_c = width
    exp = 4 if bottleneck else 1
    for stage, blocks in enumerate(stage_sizes, start=1):
        planes = width * 2 ** (stage - 1)
        for b in range(blocks):
            pre = f"layer{stage}.{b}"
            if bottleneck:
                sd[f"{pre}.conv1.weight"] = conv(planes, in_c, 1)
                bn(f"{pre}.bn1", planes)
                sd[f"{pre}.conv2.weight"] = conv(planes, planes, 3)
                bn(f"{pre}.bn2", planes)
                sd[f"{pre}.conv3.weight"] = conv(planes * exp, planes, 1)
                bn(f"{pre}.bn3", planes * exp)
            else:
                sd[f"{pre}.conv1.weight"] = conv(planes, in_c, 3)
                bn(f"{pre}.bn1", planes)
                sd[f"{pre}.conv2.weight"] = conv(planes, planes, 3)
                bn(f"{pre}.bn2", planes)
            if b == 0 and (in_c != planes * exp or stage > 1):
                sd[f"{pre}.downsample.0.weight"] = conv(planes * exp, in_c, 1)
                bn(f"{pre}.downsample.1", planes * exp)
            in_c = planes * exp
    return sd


@pytest.mark.parametrize("name,stages,bottleneck",
                         [("resnet18", (2, 2, 2, 2), False),
                          pytest.param("resnet50", (3, 4, 6, 3), True,
                                       marks=pytest.mark.slow)])
def test_torch_port_resnet(name, stages, bottleneck):
    from face_recognition_models_tpu.utils.torch_port import (
        port_torchvision_resnet)

    model = resnet18() if name == "resnet18" else resnet50()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    sd = _fake_torch_resnet_sd(stages, bottleneck)
    params, stats = port_torchvision_resnet(sd, variables, stages,
                                            bottleneck=bottleneck)
    # a couple of spot checks: kernel transposed correctly
    np.testing.assert_allclose(
        params["conv1"]["kernel"],
        np.asarray(sd["conv1.weight"]).transpose(2, 3, 1, 0))
    np.testing.assert_allclose(stats["bn1"]["mean"],
                               np.asarray(sd["bn1.running_mean"]))
    # ported tree must run
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 512)


def test_standalone_losses():
    from face_recognition_models_tpu.triplet.losses import (
        arcface_loss,
        cosface_loss,
        triplet_loss,
    )

    rs = np.random.RandomState(0)
    a, p, n = (jnp.asarray(rs.randn(8, 16), jnp.float32) for _ in range(3))
    lt = float(triplet_loss(a, p, n, margin=0.2))
    assert np.isfinite(lt) and lt >= 0
    # identical anchor/positive, far negative -> zero loss
    far = a + 100.0
    assert float(triplet_loss(a, a, far, 0.2)) == 0.0

    feats = jnp.asarray(rs.randn(8, 16), jnp.float32)
    w = jnp.asarray(rs.randn(16, 10), jnp.float32)
    labels = jnp.asarray(rs.randint(0, 10, 8))
    for fn in (cosface_loss, arcface_loss):
        loss = float(fn(feats, w, labels))
        assert np.isfinite(loss) and loss > 0
        g = jax.grad(lambda w: fn(feats, w, labels))(w)
        assert np.isfinite(np.asarray(g)).all()


def test_lfw_triplet_parser(tmp_path):
    from face_recognition_models_tpu.data.triplets import load_lfw_triplets

    ident = tmp_path / "lfw_funneled"
    (ident / "personA").mkdir(parents=True)
    files = ["personA/1.jpg", "personA/2.jpg", "personA/3.jpg",
             "personA/4.jpg"]
    for f in files:
        (ident / f).write_bytes(b"x")
    (ident / "pairs_01.txt").write_text("\n".join(files) + "\n")
    (ident / "pairs.txt").write_text("ignored\n")

    triplets = load_lfw_triplets(str(tmp_path))
    # one 4-line block -> two triplets sharing anchor/positive
    assert triplets == [("personA/1.jpg", "personA/2.jpg", "personA/3.jpg"),
                        ("personA/1.jpg", "personA/2.jpg", "personA/4.jpg")]


def test_lfw_triplet_parser_missing_file(tmp_path):
    from face_recognition_models_tpu.data.triplets import load_lfw_triplets

    ident = tmp_path / "lfw_funneled"
    ident.mkdir(parents=True)
    (ident / "pairs_01.txt").write_text("a\nb\nc\nd\n")
    with pytest.raises(FileNotFoundError):
        load_lfw_triplets(str(tmp_path))


def test_debug_helper(capsys):
    from face_recognition_models_tpu import config as cfg_lib
    from face_recognition_models_tpu.heads import get_head
    from face_recognition_models_tpu.models.resnet import BasicBlock, ResNet
    from face_recognition_models_tpu.utils.debug import infer_and_compute_loss

    model = ResNet(stage_sizes=(1,), block=BasicBlock, embed_dim=16,
                   num_filters=8, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 3)), train=False)
    cfg = cfg_lib.make_head_config("arcface", feature_dim=16, num_classes=5)
    head = get_head("arcface")
    kernel = head.init_kernel(jax.random.PRNGKey(1), cfg)
    loss = infer_and_compute_loss(
        model, head, cfg, variables, kernel,
        jnp.zeros((4, 16, 16, 3)), jnp.asarray([0, 1, 2, 3]))
    assert np.isfinite(float(loss))
    assert "[debug]" in capsys.readouterr().out


def test_step_timer():
    from face_recognition_models_tpu.utils.profiling import StepTimer

    timer = StepTimer(sync_every=5)
    x = jnp.zeros((4,))
    for _ in range(20):
        x = x + 1.0
        timer.tick(x)
    assert np.isfinite(timer.seconds_per_step)
    assert timer.seconds_per_step >= 0.0


@pytest.mark.slow
def test_cli_train_optimizer_scheduler_flags(tmp_path, capsys):
    """`face train` exposes the optimizer/scheduler factories (the
    reference ships them, optimizers.py:3-71 / schedulers.py:3-104, but
    hardcodes SGD+customstep at model_utils.py:556-558): a synthetic run
    with adamw + warmup_cosine + --flip trains end to end and reports a
    finite decreasing loss."""
    from face_recognition_models_tpu.cli.main import main

    rc = main(["train", "--synthetic", "--synthetic-classes", "4",
               "--synthetic-per-class", "4", "--image-size", "32",
               "-bs", "8", "-e", "2", "-lr", "1e-3",
               "--optimizer", "adamw", "--weight-decay", "0.01",
               "--scheduler", "warmup_cosine", "--warmup-epochs", "1",
               "--flip", "--backbone", "resnet18", "--head", "cosface",
               "--working-path", str(tmp_path), "--print_freq", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Loss" in out


def test_cli_help_renders_clean(capsys):
    """`face --help` must render: an unescaped '%' in any help string
    makes argparse %-interpolate the action dict into the text (or raise
    ValueError on other format sequences)."""
    from face_recognition_models_tpu.cli.main import main

    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "option_strings" not in out
    assert "serve" in out


def test_cli_train_rejects_unknown_optimizer(tmp_path):
    from face_recognition_models_tpu.cli.main import main

    with pytest.raises(ValueError, match="Unknown optimizer"):
        main(["train", "--synthetic", "--synthetic-classes", "4",
              "--synthetic-per-class", "4", "--image-size", "32",
              "-bs", "8", "-e", "1", "--optimizer", "sophia",
              "--working-path", str(tmp_path)])


def test_enable_compilation_cache(tmp_path):
    import jax

    from face_recognition_models_tpu.utils.compile_cache import (
        enable_compilation_cache)

    d = tmp_path / "nested" / "cache"
    enable_compilation_cache(str(d))
    assert d.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(d)
    assert jax.config.jax_persistent_cache_min_entry_size_bytes == -1
    enable_compilation_cache(str(d))  # idempotent
