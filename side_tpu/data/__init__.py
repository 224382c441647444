from . import geometry, kitti, targets  # noqa: F401
