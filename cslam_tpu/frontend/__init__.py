"""Front-end: loop-closure detection orchestration, sensor handlers
(visual + lidar), keyframe management."""
