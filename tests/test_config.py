"""SwarmConfig YAML interop: the shipped example and reference-style files."""

import os

from cslam_tpu.config import SwarmConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_example_yaml_loads():
    cfg = SwarmConfig.from_yaml(os.path.join(REPO, "config", "example.yaml"),
                                robot_id=2)
    assert cfg.robot_id == 2
    assert cfg.frontend.sensor_type == "stereo"
    assert cfg.frontend.inter_robot_loop_closure_budget == 5
    assert cfg.frontend.nns_method == "auto"
    assert cfg.neighbor_management.enable_neighbor_monitoring is True
    assert cfg.backend.pose_graph_optimization_start_period_ms == 500
    flat = cfg.to_flat_dict()
    assert flat["frontend.similarity_threshold"] == 0.9
    assert flat["frontend.netvlad.pca_checkpoint"] == ""


def test_reference_style_yaml_with_unknown_keys(tmp_path):
    """A reference deployment's YAML (incl. keys we don't model, like
    image topics) loads without error; unknown keys are ignored."""
    p = tmp_path / "ref.yaml"
    p.write_text("""
/**:
  ros__parameters:
    frontend:
      left_image_topic: "stereo_camera/left/image_rect_color"
      sensor_type: "rgbd"
      similarity_threshold: 0.1
      global_descriptor_technique: "netvlad"
      netvlad:
        pca_checkpoint: "models/pca.pkl"
    backend:
      max_waiting_time_sec: 60
""")
    cfg = SwarmConfig.from_yaml(str(p))
    assert cfg.frontend.sensor_type == "rgbd"
    assert cfg.frontend.similarity_threshold == 0.1
    assert cfg.frontend.netvlad_pca_checkpoint == "models/pca.pkl"
    assert cfg.backend.max_waiting_time_sec == 60
