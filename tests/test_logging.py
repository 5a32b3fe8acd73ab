"""MetricTracker / Tee — the L6 console+file reporting module."""

import contextlib
import io

from face_recognition_models_tpu.utils.logging import (
    TRAIN_COLUMNS,
    MetricTracker,
    Tee,
)


def test_tracker_weighted_averages_and_line():
    t = MetricTracker(100, [("loss", "Loss", ".3f"), ("acc1", "Acc@1", "5.2f")],
                      prefix="Epoch: [2/30]")
    t.observe({"loss": 4.0, "acc1": 10.0}, weight=2)
    t.observe({"loss": 1.0, "acc1": 40.0}, weight=6)
    assert abs(t.average("loss") - (4.0 * 2 + 1.0 * 6) / 8) < 1e-12
    assert abs(t.averages()["acc1"] - 32.5) < 1e-12
    line = t.line(7)
    # last value and running average both render, step padded to total width
    assert line.startswith("Epoch: [2/30][  7/100]")
    assert "Loss 1.000 (1.750)" in line
    assert "Acc@1 40.00 (32.50)" in line


def test_tracker_skips_unseen_and_accepts_extra_keys():
    t = MetricTracker(10, TRAIN_COLUMNS)
    t.observe({"loss": 2.0, "lr": 0.1})  # lr: tracked but not rendered
    line = t.line(0)
    assert "Loss" in line and "lr" not in line and "Acc@1" not in line
    assert t.average("lr") == 0.1
    assert t.average("never_seen") == 0.0


def test_tee_fans_out_and_reports_fileno():
    a, b = io.StringIO(), io.StringIO()
    tee = Tee(a, b)
    with contextlib.redirect_stdout(tee):
        print("hello", end="")
    tee.flush()
    assert a.getvalue() == "hello" and b.getvalue() == "hello"
    assert tee.writable() and not tee.isatty()
    import pytest
    with pytest.raises(io.UnsupportedOperation):
        tee.fileno()  # StringIO has no fd


def test_tee_with_real_stdout_logfile(tmp_path):
    path = tmp_path / "log.txt"
    with open(path, "w") as f:
        tee = Tee(io.StringIO(), f)
        with contextlib.redirect_stdout(tee):
            print("step 1")
    assert path.read_text() == "step 1\n"


def test_experiment_logger_artifact_jsonl(tmp_path):
    """save_artifact must leave a trace in the offline JSONL fallback
    (the reference uploads checkpoints via wandb.save,
    model_utils.py:581-582)."""
    import json

    from face_recognition_models_tpu.utils import ExperimentLogger

    logger = ExperimentLogger("proj", "run1", log_dir=str(tmp_path),
                              use_wandb=False)
    art = tmp_path / "ckpt"
    art.mkdir()
    logger.save_artifact(str(art))
    logger.finish()
    lines = [json.loads(x) for x in
             (tmp_path / "run1.metrics.jsonl").read_text().splitlines()]
    events = [x for x in lines if x.get("event") == "artifact"]
    assert len(events) == 1 and events[0]["path"] == str(art)
