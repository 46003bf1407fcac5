from .avi import read_avi_structure, write_avi
from .mp4 import read_mp4_structure, write_mp4
from .mocap_player import nb_play_mocap, render_mocap_player_html
from .pose2bvh import (
    pose2bvh,
    pose2bvh_consistent,
    sample2bvh_batch,
    butter_lowpass_filter,
)

__all__ = ["pose2bvh", "pose2bvh_consistent", "sample2bvh_batch",
           "butter_lowpass_filter", "write_avi", "read_avi_structure",
           "write_mp4", "read_mp4_structure",
           "nb_play_mocap", "render_mocap_player_html"]
