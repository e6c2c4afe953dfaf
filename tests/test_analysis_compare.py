"""Metrics JSONL + cross-run analysis (SURVEY.md §2.9 component #51 —
the reference's analysis_feats_compare.py log-curve comparison)."""
import json
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import analysis_compare


def _write_jsonl(path, epochs=5, c=13):
    with open(path, "w") as f:
        for e in range(epochs):
            f.write(json.dumps({
                "epoch": e, "train_loss": 2.0 - 0.1 * e,
                "lr": 1e-3 * 0.9 ** e,
                "miou": 0.1 + 0.05 * e, "oiou": 0.2 + 0.05 * e,
                "oacc": 0.5 + 0.03 * e,
                "iou": [0.1 * ((e + i) % 5) for i in range(c)],
                "acc": [0.5] * c}) + "\n")


def _write_log(path, epochs=5):
    with open(path, "w") as f:
        for e in range(epochs):
            f.write(f"ts INFO epoch {e} train-loss {2.0 - 0.09 * e:.4f} | "
                    f"test mIoU {0.1 + 0.04 * e:.4f} oIoU "
                    f"{0.2 + 0.04 * e:.4f} oAcc {0.5 + 0.02 * e:.4f} | "
                    "100000 points/s\n")


def test_load_run_jsonl_and_log(tmp_path):
    j, l = tmp_path / "a.metrics.jsonl", tmp_path / "b.log"
    _write_jsonl(j)
    _write_log(l)
    rj, rl = analysis_compare.load_run(str(j)), analysis_compare.load_run(
        str(l))
    assert len(rj) == len(rl) == 5
    assert rj[2]["epoch"] == rl[2]["epoch"] == 2
    assert abs(rj[-1]["miou"] - 0.3) < 1e-9
    assert abs(rl[-1]["miou"] - 0.26) < 1e-9
    assert len(rj[0]["iou"]) == 13 and "iou" not in rl[0]


def test_analysis_main_end_to_end(tmp_path):
    j, l = tmp_path / "a.metrics.jsonl", tmp_path / "b.log"
    _write_jsonl(j)
    _write_log(l)
    out = tmp_path / "out"
    summary = analysis_compare.main([str(j), str(l), "--labels", "A", "B",
                                     "--per-class", "--class-names",
                                     "s3dis", "--out-dir", str(out)])
    assert set(summary) == {"A", "B"}
    assert abs(summary["A"]["final"] - 0.3) < 1e-9
    assert summary["A"]["best_epoch"] == 4
    assert (out / "compare_miou.png").exists()
    assert (out / "per_class_A.png").exists()
    assert (out / "summary.json").exists()


def test_run_dir_curves(tmp_path):
    """One command on a run DIR produces the loss/lr/mIoU curve panel —
    the reference's tf.summary scalar curves
    (train_gpn_scannet_new.py:85,131,283)."""
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    _write_jsonl(run_dir / "metrics.jsonl")
    out = tmp_path / "out"
    analysis_compare.main([str(run_dir), "--labels", "R", "--curves",
                           "--out-dir", str(out)])
    assert (out / "curves_R.png").exists()


def test_cli_metrics_writer(tmp_path):
    from pointcloudsegmentation_tpu.train import cli, config as config_lib

    mpath = tmp_path / "m.jsonl"
    args = SimpleNamespace(metrics_file=str(mpath), log_file=None)
    cfg = config_lib.s3dis_config()
    write = cli._metrics_writer(args, cfg)
    write({"epoch": 0, "miou": np.float32(0.5),
           "iou": np.arange(3, dtype=np.float32)})
    write({"epoch": 1, "miou": 0.6, "iou": [0.1, 0.2, 0.3]})
    recs = analysis_compare.load_run(str(mpath))
    assert len(recs) == 2
    assert recs[0]["iou"] == [0.0, 1.0, 2.0]
    assert abs(recs[1]["miou"] - 0.6) < 1e-9

    # no sink configured -> no-op
    noop = cli._metrics_writer(
        SimpleNamespace(metrics_file=None, log_file=None),
        config_lib.s3dis_config(checkpoint_dir=None))
    noop({"epoch": 0, "miou": 0.1})
