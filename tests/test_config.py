"""Config engine tests: composition, interpolation, overrides, instantiate."""
from pathlib import Path

import pytest

from instantavatar_tpu.config import instantiate, load_config, to_yaml


@pytest.fixture()
def conf_dir(tmp_path: Path) -> Path:
    d = tmp_path / "confs"
    (d / "dataset" / "peoplesnapshot").mkdir(parents=True)
    (d / "network").mkdir()
    (d / "top.yaml").write_text(
        "defaults:\n"
        "  - dataset: peoplesnapshot/male-3-casual\n"
        "  - network: ngp\n"
        "experiment: baseline\n"
        "train:\n"
        "  max_epochs: 30\n"
        "  precision: 16\n"
        "out_dir: outputs/${dataset.subject}/${experiment}\n"
    )
    (d / "dataset" / "peoplesnapshot" / "male-3-casual.yaml").write_text(
        "subject: male-3-casual\ngender: male\ndownscale: 2\n"
    )
    (d / "dataset" / "peoplesnapshot" / "female-4-casual.yaml").write_text(
        "subject: female-4-casual\ngender: female\ndownscale: 2\n"
    )
    (d / "network" / "ngp.yaml").write_text(
        "name: ngp\nlevels: 16\ngender_tag: ${dataset.gender}\n"
    )
    return d


def test_compose_and_interpolate(conf_dir):
    cfg = load_config(conf_dir, "top")
    assert cfg.dataset.subject == "male-3-casual"
    assert cfg.network.levels == 16
    assert cfg.out_dir == "outputs/male-3-casual/baseline"
    # cross-group interpolation like confs/deformer/fast_snarf.yaml
    assert cfg.network.gender_tag == "male"


def test_group_override(conf_dir):
    cfg = load_config(conf_dir, "top", ["dataset=peoplesnapshot/female-4-casual"])
    assert cfg.dataset.subject == "female-4-casual"
    assert cfg.network.gender_tag == "female"


def test_kv_overrides(conf_dir):
    cfg = load_config(
        conf_dir, "top",
        ["train.max_epochs=200", "+sampler.dilate=8", "train.lr=5e-4"],
    )
    assert cfg.train.max_epochs == 200
    assert cfg.sampler.dilate == 8
    assert abs(cfg.train.lr - 5e-4) < 1e-12


def test_yaml_roundtrip(conf_dir):
    cfg = load_config(conf_dir, "top")
    text = to_yaml(cfg)
    assert "male-3-casual" in text


def test_instantiate():
    from instantavatar_tpu.config import Config

    node = Config({"_target_": "collections.OrderedDict", "a": 1, "b": 2})
    obj = instantiate(node)
    assert obj["a"] == 1 and obj["b"] == 2


def test_instantiate_non_recursive():
    from instantavatar_tpu.config import Config

    inner = Config({"_target_": "builtins.dict", "x": 1})
    node = Config({"_target_": "collections.OrderedDict", "inner": inner})
    obj = instantiate(node)  # non-recursive: inner stays a Config
    assert isinstance(obj["inner"], dict)
    assert obj["inner"]["_target_"] == "builtins.dict"


def test_interpolation_cycle_detect(tmp_path):
    d = tmp_path
    (d / "bad.yaml").write_text("a: ${b}\nb: ${a}\n")
    with pytest.raises(ValueError):
        load_config(d, "bad")
