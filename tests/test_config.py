import numpy as np
import pytest

from voxelnet_tpu.config import get_config


def test_car_defaults_match_reference_grid():
    # reference voxelnet/config.py:37-59 derived values
    cfg = get_config("Car")
    assert cfg.object.grid_size == (10, 400, 352)
    assert cfg.object.feature_height == 200
    assert cfg.object.feature_width == 176
    assert cfg.object.points_per_voxel == 35
    assert cfg.object.anchor_z == pytest.approx(-1.78)
    assert cfg.object.rpn_pos_iou == 0.6
    assert cfg.object.rpn_neg_iou == 0.45
    assert cfg.object.num_anchors == 200 * 176 * 2


def test_pedestrian_cyclist_presets():
    # reference voxelnet/config.py:60-92
    ped = get_config("Pedestrian")
    assert ped.object.grid_size == (10, 200, 240)
    assert ped.object.points_per_voxel == 45
    assert ped.object.anchor_h == 1.73
    assert ped.object.anchor_z == pytest.approx(-0.6 - 1.73 / 2)
    cyc = get_config("Cyclist")
    assert cyc.object.anchor_l == 1.76
    assert cyc.object.rpn_pos_iou == 0.5


def test_unknown_class_raises():
    with pytest.raises(ValueError):
        get_config("Tram")


def test_override_and_yaml_roundtrip(tmp_path):
    cfg = get_config("Car", train={"lr": 0.005, "batch_size": 4})
    assert cfg.train.lr == 0.005
    text = cfg.dump_yaml()
    assert "0.005" in text

    yaml_path = tmp_path / "override.yaml"
    yaml_path.write_text("train:\n  num_epochs: 42\nrpn:\n  nms_thres: 0.2\n")
    merged = cfg.merge_from_file(str(yaml_path))
    assert merged.train.num_epochs == 42
    assert merged.rpn.nms_thres == 0.2
    assert merged.train.lr == 0.005  # untouched keys survive


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        get_config("Car", train={"no_such_key": 1})


def test_calib_matrices():
    cfg = get_config("Car")
    T = cfg.calib.T_VELO_2_CAM()
    assert T.shape == (4, 4)
    assert np.allclose(T[3], [0, 0, 0, 1])
