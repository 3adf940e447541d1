"""Built-in track specs.

Reference parity (SURVEY.md §2 "Track / Map"): the reference hard-codes its
tracks as ordered ``(length, curvature)`` segment lists (0 = straight).  Two
built-ins here:

- ``OVAL_SEGMENTS``      — the "reference oval": two straights + two 180-deg
                           arcs (BASELINE.json config 1).
- ``RACETRACK_SEGMENTS`` — a longer closed circuit: rounded rectangle with a
                           detour "tab" and an S-chicane spliced into the
                           straights (BASELINE.json config 2). Both chicane
                           blocks net zero heading / zero offset, so closure
                           is exact by construction.
"""

from __future__ import annotations

import math

from .track import Track, compile_track

# Minimum drivable radius: delta_max = 0.30 rad and wheelbase L = 0.25 m
# give R_min = L / tan(delta_max) ~= 0.81 m; all radii below keep margin.
_R = 1.0            # oval corner radius [m]
_K = 1.0 / _R

OVAL_SEGMENTS = (
    (2.0, 0.0),
    (math.pi * _R, _K),
    (2.0, 0.0),
    (math.pi * _R, _K),
)


def _quarter(radius: float, sign: float):
    return (math.pi / 2 * radius, sign / radius)


def _tab(radius: float):
    """Detour block: +90,-90,-90,+90 quarter arcs of equal radius.

    Net heading change 0, net lateral offset 0; advances 4*radius along the
    original direction (verified in tests/test_track.py).
    """
    return [
        _quarter(radius, +1.0),
        _quarter(radius, -1.0),
        _quarter(radius, -1.0),
        _quarter(radius, +1.0),
    ]


def _schicane(radius: float):
    """Mirror-image detour (dips to the right instead of the left)."""
    return [
        _quarter(radius, -1.0),
        _quarter(radius, +1.0),
        _quarter(radius, +1.0),
        _quarter(radius, -1.0),
    ]


def _racetrack_segments():
    r_corner = 1.3      # rounded-rectangle corner radius
    r_chi = 1.0         # chicane radius
    long_straight = 7.0
    short_straight = 2.5
    segs = []
    # bottom straight with a tab spliced in
    segs += [(1.0, 0.0)]
    segs += _tab(r_chi)
    segs += [(long_straight - 1.0 - 4 * r_chi, 0.0)]
    segs += [_quarter(r_corner, +1.0)]
    # right straight
    segs += [(short_straight, 0.0)]
    segs += [_quarter(r_corner, +1.0)]
    # top straight with an S-chicane
    segs += [(0.8, 0.0)]
    segs += _schicane(r_chi)
    segs += [(long_straight - 0.8 - 4 * r_chi, 0.0)]
    segs += [_quarter(r_corner, +1.0)]
    # left straight
    segs += [(short_straight, 0.0)]
    segs += [_quarter(r_corner, +1.0)]
    return tuple(segs)


RACETRACK_SEGMENTS = _racetrack_segments()


def oval_track(width: float = 0.8, ds: float = 0.02) -> Track:
    return compile_track(OVAL_SEGMENTS, width=width, ds=ds)


def racetrack(width: float = 0.8, ds: float = 0.02) -> Track:
    return compile_track(RACETRACK_SEGMENTS, width=width, ds=ds)
