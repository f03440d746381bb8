from gdslam_tpu.core import lie, camera  # noqa: F401
