from . import mocap_transforms
from .bvh import BvhData, parse_bvh, write_bvh
from .skeleton import Skeleton
from .pose_converter import PoseTypeConverter

__all__ = ["BvhData", "parse_bvh", "write_bvh", "Skeleton", "PoseTypeConverter",
           "mocap_transforms"]
