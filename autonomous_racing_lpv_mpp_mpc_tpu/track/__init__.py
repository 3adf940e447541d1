from .track import (
    Track,
    compile_track,
    track_from_centerline,
    curvature_at,
    centerline_pose,
    frenet_to_global,
    global_to_frenet,
    wrap_s,
)
from .specs import OVAL_SEGMENTS, RACETRACK_SEGMENTS, oval_track, racetrack

__all__ = [
    "Track",
    "compile_track",
    "track_from_centerline",
    "curvature_at",
    "centerline_pose",
    "frenet_to_global",
    "global_to_frenet",
    "wrap_s",
    "OVAL_SEGMENTS",
    "RACETRACK_SEGMENTS",
    "oval_track",
    "racetrack",
]
