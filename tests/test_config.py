import json
import os

from ssunet_gan_tpu.config import (
    coerce_string_bool,
    dump_model_card,
    load_experiment_config,
    load_model_card,
)


def _write_config(tmp_path, opt_overrides=None):
    opt = {
        "name": "None",
        "resume": "False",
        "epochs": 2,
        "batch_size": 2,
        "arch": "UNet",
        "deep_supervision": "False",
        "input_channels": 3,
        "num_classes": 3,
        "dataset": "toy",
        "nesterov": "False",
    }
    opt.update(opt_overrides or {})
    cfg = {
        "file_path": {
            "input_path": str(tmp_path / "inputs"),
            "model_path": str(tmp_path / "models"),
            "output_path": str(tmp_path / "outputs"),
            "checkpoint_path": str(tmp_path / "checkpoint"),
        },
        "opt_config": opt,
        "val_config": {"name": "toy_model", "patch_overlap": 0.5},
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_string_bool_coercion_matches_reference_semantics():
    # reference: `'False' in value` (train.py:210-218)
    assert coerce_string_bool("False") is False
    assert coerce_string_bool("True") is True
    assert coerce_string_bool("anything-else") is True
    assert coerce_string_bool(True) is True
    assert coerce_string_bool(False) is False


def test_load_experiment_config_coerces_and_autonames(tmp_path):
    cfg = load_experiment_config(_write_config(tmp_path))
    opt = cfg.opt_config
    assert opt["deep_supervision"] is False
    assert opt["nesterov"] is False
    assert opt["resume"] is False
    # 'None' name → '<dataset>_<arch>_segmodel' (train.py:220-225)
    assert opt["name"] == "toy_UNet_segmodel"
    assert cfg.val_config["patch_overlap"] == 0.5


def test_explicit_name_preserved(tmp_path):
    cfg = load_experiment_config(_write_config(tmp_path, {"name": "my_model"}))
    assert cfg.opt_config["name"] == "my_model"


def test_model_card_roundtrip(tmp_path):
    cfg = load_experiment_config(_write_config(tmp_path))
    model_dir = os.path.join(cfg.file_path.model_path, cfg.name)
    card = dump_model_card(cfg.opt_config, model_dir)
    assert os.path.exists(card)
    loaded = load_model_card(model_dir)
    assert loaded == cfg.opt_config
