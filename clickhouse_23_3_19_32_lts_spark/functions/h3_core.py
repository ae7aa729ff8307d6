"""Pure-Python H3 v3 core: the icosahedral gnomonic projection subset.

Implements geoToH3 / h3ToGeo / kRing / h3ToGeoBoundary & friends from the
PUBLIC H3 v3 specification (https://h3geo.org/docs — bit layout, aperture-7
hex grid, gnomonic face projection). The reference (src/Functions/geoToH3.cpp,
h3ToGeo.cpp, h3kRing.cpp ...) wraps libh3 for these; this module re-derives
the same math in Python so no native geometry library is needed.

Spec data entered here (published constants, Apache-2.0 H3 repo):
  - 20 face center lat/lngs and i-axis azimuths (faceijk.c tables)
  - 122 base cell home placements + pentagon/cw-offset flags (baseCells.c)

Everything else is DERIVED at import time from those plus the projection:
  - per-face-pair overage motions (H3's faceNeighbors translate/rotations),
    via exact grid alignment on the shared icosahedron edge
  - face -> base-cell lookup (H3's faceIjkBaseCells), via fold-then-match
    against base cell centers
  - the digit-stepping tables behind kRing (H3's NEW_DIGIT_II/III,
    NEW_ADJUSTMENT_II/III), via integer aperture-7 algebra
The derivations are cross-checked at import (every base cell must round-trip
its own home placement) and the whole module is validated against the
reference's stateless test vectors (tests/test_geo.py).
"""

from __future__ import annotations

import math

MAX_RES = 15
NUM_BASE_CELLS = 122

M_SQRT7 = math.sqrt(7.0)
RES0_U_GNOMONIC = 0.38196601125010500003
M_SIN60 = math.sqrt(3.0) / 2.0
M_AP7_ROT_RADS = math.asin(math.sqrt(3.0 / 28.0))
EARTH_RADIUS_KM = 6371.007180918475

# face center latitudes/longitudes in radians (faceijk.c faceCenterGeo)
FACE_CENTER_GEO = (
    (0.803582649718989942, 1.248397419617396099),
    (1.307747883455638156, 2.536945009877921159),
    (1.054751253523952054, -1.347517358900396623),
    (0.600191595538186799, -0.450603909469755746),
    (0.491715428198773866, 0.401988202911306943),
    (0.172745327415618701, 1.678146885280433686),
    (0.605929321571350690, 2.953923329812411617),
    (0.427370518328979641, -1.888876200336285401),
    (-0.079066118549212831, -0.733429513380867741),
    (-0.230961644455383637, 0.506495587332349035),
    (0.079066118549212831, 2.408163140208925497),
    (0.230961644455383637, -2.635097066257444203),
    (-0.172745327415618701, -1.463445768309359553),
    (-0.605929321571350690, -0.187669323777381622),
    (-0.427370518328979641, 1.252716453253609838),
    (-0.600191595538186799, 2.690988744120037492),
    (-0.491715428198773866, -2.739604450678486295),
    (-0.803582649718989942, -1.893195233972397139),
    (-1.307747883455638156, -0.604647643711872080),
    (-1.054751253523952054, 1.794075294689396615),
)

# azimuth (radians) from each face center to its i-axis vertex
# (faceijk.c faceAxesAzRadsCII column 0; columns 1/2 = this - 2pi/3, -4pi/3)
FACE_AXES_AZ_I = (
    5.619958268523939882,
    5.760339081714187279,
    0.780213654393430055,
    0.430469363979999913,
    6.130269123335111400,
    2.692877706530642877,
    2.982963003477243874,
    3.532912002790141181,
    3.494305004259568154,
    3.003214169499538391,
    5.930472956509811562,
    0.138378484090254847,
    0.448714947059150361,
    0.158629650112549365,
    5.891865957979238535,
    2.711123289609793325,
    3.294508837434268316,
    3.804819692245439833,
    3.664438879055193436,
    2.361378999196363184,
)

# base cell data (baseCells.c): (home_face, (i, j, k), is_pentagon,
# (cw_offset_face_1, cw_offset_face_2))
BASE_CELL_DATA = (
    (1, (1, 0, 0), 0, (-1, -1)), (2, (1, 1, 0), 0, (-1, -1)),
    (1, (0, 0, 0), 0, (-1, -1)), (2, (1, 0, 0), 0, (-1, -1)),
    (0, (2, 0, 0), 1, (-1, -1)), (1, (1, 1, 0), 0, (-1, -1)),
    (1, (0, 0, 1), 0, (-1, -1)), (2, (0, 0, 0), 0, (-1, -1)),
    (0, (1, 0, 0), 0, (-1, -1)), (2, (0, 1, 0), 0, (-1, -1)),
    (1, (0, 1, 0), 0, (-1, -1)), (1, (0, 1, 1), 0, (-1, -1)),
    (3, (1, 0, 0), 0, (-1, -1)), (3, (1, 1, 0), 0, (-1, -1)),
    (11, (2, 0, 0), 1, (2, 6)), (4, (1, 0, 0), 0, (-1, -1)),
    (0, (0, 0, 0), 0, (-1, -1)), (6, (0, 1, 0), 0, (-1, -1)),
    (0, (0, 0, 1), 0, (-1, -1)), (2, (0, 1, 1), 0, (-1, -1)),
    (7, (0, 0, 1), 0, (-1, -1)), (2, (0, 0, 1), 0, (-1, -1)),
    (0, (1, 1, 0), 0, (-1, -1)), (6, (0, 0, 1), 0, (-1, -1)),
    (10, (2, 0, 0), 1, (1, 5)), (6, (0, 0, 0), 0, (-1, -1)),
    (3, (0, 0, 0), 0, (-1, -1)), (11, (1, 0, 0), 0, (-1, -1)),
    (4, (1, 1, 0), 0, (-1, -1)), (3, (0, 1, 0), 0, (-1, -1)),
    (0, (0, 1, 1), 0, (-1, -1)), (4, (0, 0, 0), 0, (-1, -1)),
    (5, (0, 1, 0), 0, (-1, -1)), (0, (0, 1, 0), 0, (-1, -1)),
    (7, (0, 1, 0), 0, (-1, -1)), (11, (1, 1, 0), 0, (-1, -1)),
    (7, (0, 0, 0), 0, (-1, -1)), (10, (1, 0, 0), 0, (-1, -1)),
    (12, (2, 0, 0), 1, (3, 7)), (6, (1, 0, 1), 0, (-1, -1)),
    (7, (1, 0, 1), 0, (-1, -1)), (4, (0, 0, 1), 0, (-1, -1)),
    (3, (0, 0, 1), 0, (-1, -1)), (3, (0, 1, 1), 0, (-1, -1)),
    (4, (0, 1, 0), 0, (-1, -1)), (6, (1, 0, 0), 0, (-1, -1)),
    (11, (0, 0, 0), 0, (-1, -1)), (8, (0, 0, 1), 0, (-1, -1)),
    (5, (0, 0, 1), 0, (-1, -1)), (14, (2, 0, 0), 1, (0, 9)),
    (5, (0, 0, 0), 0, (-1, -1)), (12, (1, 0, 0), 0, (-1, -1)),
    (10, (1, 1, 0), 0, (-1, -1)), (4, (0, 1, 1), 0, (-1, -1)),
    (12, (1, 1, 0), 0, (-1, -1)), (7, (1, 0, 0), 0, (-1, -1)),
    (11, (0, 1, 0), 0, (-1, -1)), (10, (0, 0, 0), 0, (-1, -1)),
    (13, (2, 0, 0), 1, (4, 8)), (10, (0, 0, 1), 0, (-1, -1)),
    (11, (0, 0, 1), 0, (-1, -1)), (9, (0, 1, 0), 0, (-1, -1)),
    (8, (0, 1, 0), 0, (-1, -1)), (6, (2, 0, 0), 1, (11, 15)),
    (8, (0, 0, 0), 0, (-1, -1)), (9, (0, 0, 1), 0, (-1, -1)),
    (14, (1, 0, 0), 0, (-1, -1)), (5, (1, 0, 1), 0, (-1, -1)),
    (16, (0, 1, 1), 0, (-1, -1)), (8, (1, 0, 1), 0, (-1, -1)),
    (5, (1, 0, 0), 0, (-1, -1)), (12, (0, 0, 0), 0, (-1, -1)),
    (7, (2, 0, 0), 1, (12, 16)), (12, (0, 1, 0), 0, (-1, -1)),
    (10, (0, 1, 0), 0, (-1, -1)), (9, (0, 0, 0), 0, (-1, -1)),
    (13, (1, 0, 0), 0, (-1, -1)), (16, (0, 0, 1), 0, (-1, -1)),
    (15, (0, 1, 1), 0, (-1, -1)), (15, (0, 1, 0), 0, (-1, -1)),
    (16, (0, 1, 0), 0, (-1, -1)), (14, (1, 1, 0), 0, (-1, -1)),
    (13, (1, 1, 0), 0, (-1, -1)), (5, (2, 0, 0), 1, (10, 19)),
    (8, (1, 0, 0), 0, (-1, -1)), (14, (0, 0, 0), 0, (-1, -1)),
    (9, (1, 0, 1), 0, (-1, -1)), (14, (0, 0, 1), 0, (-1, -1)),
    (17, (0, 0, 1), 0, (-1, -1)), (12, (0, 0, 1), 0, (-1, -1)),
    (16, (0, 0, 0), 0, (-1, -1)), (17, (0, 1, 1), 0, (-1, -1)),
    (15, (0, 0, 1), 0, (-1, -1)), (16, (1, 0, 1), 0, (-1, -1)),
    (9, (1, 0, 0), 0, (-1, -1)), (15, (0, 0, 0), 0, (-1, -1)),
    (13, (0, 0, 0), 0, (-1, -1)), (8, (2, 0, 0), 1, (13, 17)),
    (13, (0, 1, 0), 0, (-1, -1)), (17, (1, 0, 1), 0, (-1, -1)),
    (19, (0, 1, 0), 0, (-1, -1)), (14, (0, 1, 0), 0, (-1, -1)),
    (19, (0, 1, 1), 0, (-1, -1)), (17, (0, 1, 0), 0, (-1, -1)),
    (13, (0, 0, 1), 0, (-1, -1)), (17, (0, 0, 0), 0, (-1, -1)),
    (16, (1, 0, 0), 0, (-1, -1)), (9, (2, 0, 0), 1, (14, 18)),
    (15, (1, 0, 1), 0, (-1, -1)), (15, (1, 0, 0), 0, (-1, -1)),
    (18, (0, 1, 1), 0, (-1, -1)), (18, (0, 0, 1), 0, (-1, -1)),
    (19, (0, 0, 1), 0, (-1, -1)), (17, (1, 0, 0), 0, (-1, -1)),
    (19, (0, 0, 0), 0, (-1, -1)), (18, (0, 1, 0), 0, (-1, -1)),
    (18, (1, 0, 1), 0, (-1, -1)), (19, (2, 0, 0), 1, (-1, -1)),
    (19, (1, 0, 0), 0, (-1, -1)), (18, (0, 0, 0), 0, (-1, -1)),
    (19, (1, 0, 1), 0, (-1, -1)), (18, (1, 0, 0), 0, (-1, -1)),
)

PENTAGON_CELLS = frozenset(i for i, d in enumerate(BASE_CELL_DATA) if d[2])
# the two polar pentagons (home vertex of the polar faces)
POLAR_PENTAGONS = (4, 117)

# -- spherical helpers -------------------------------------------------------


def _geo_to_vec3(lat: float, lng: float) -> tuple:
    c = math.cos(lat)
    return (math.cos(lng) * c, math.sin(lng) * c, math.sin(lat))


def _pos_angle(a: float) -> float:
    """libh3 _posAngleRads: single conditional add/subtract, NOT fmod —
    for inputs >= 2π the rounded subtraction differs from fmod's exact
    remainder in the last bit, and printed doubles must match."""
    tau = 2.0 * math.pi
    tmp = a + tau if a < 0.0 else a
    if tmp >= tau:
        tmp -= tau
    return tmp


def _geo_azimuth(lat1, lng1, lat2, lng2) -> float:
    return math.atan2(
        math.cos(lat2) * math.sin(lng2 - lng1),
        math.cos(lat1) * math.sin(lat2)
        - math.sin(lat1) * math.cos(lat2) * math.cos(lng2 - lng1),
    )


def _geo_dist_rads(lat1, lng1, lat2, lng2) -> float:
    sl = math.sin((lat2 - lat1) / 2.0)
    sg = math.sin((lng2 - lng1) / 2.0)
    a = sl * sl + math.cos(lat1) * math.cos(lat2) * sg * sg
    return 2.0 * math.asin(math.sqrt(min(1.0, a)))


_EPSILON = 1.0e-12  # coordgeom EPSILON_RAD-scale guard (libh3 EPSILON)


def _constrain_lng(lng: float) -> float:
    while lng > math.pi:
        lng -= 2 * math.pi
    while lng < -math.pi:
        lng += 2 * math.pi
    return lng


def _az_dist_to_geo(lat, lng, az, dist) -> tuple:
    """libh3 _geoAzDistanceRads, operation-for-operation (the sinlon/coslon
    quotient form, clamps, pole/due-north cases) so vertex coordinates match
    the reference's printed doubles bit-for-bit."""
    if dist < _EPSILON:
        return (lat, lng)
    az = _pos_angle(az)
    if az < _EPSILON or abs(az - math.pi) < _EPSILON:
        # due north/south
        if az < _EPSILON:
            lat2 = lat + dist
        else:
            lat2 = lat - dist
        if abs(lat2 - math.pi / 2) < _EPSILON:  # north pole
            return (math.pi / 2, 0.0)
        if abs(lat2 + math.pi / 2) < _EPSILON:  # south pole
            return (-math.pi / 2, 0.0)
        return (lat2, _constrain_lng(lng))
    sinlat = math.sin(lat) * math.cos(dist) + math.cos(lat) * math.sin(
        dist
    ) * math.cos(az)
    sinlat = max(-1.0, min(1.0, sinlat))
    lat2 = math.asin(sinlat)
    if abs(lat2 - math.pi / 2) < _EPSILON:
        return (math.pi / 2, 0.0)
    if abs(lat2 + math.pi / 2) < _EPSILON:
        return (-math.pi / 2, 0.0)
    sinlon = math.sin(az) * math.sin(dist) / math.cos(lat2)
    coslon = (math.cos(dist) - math.sin(lat) * math.sin(lat2)) / math.cos(
        lat
    ) / math.cos(lat2)
    sinlon = max(-1.0, min(1.0, sinlon))
    coslon = max(-1.0, min(1.0, coslon))
    return (lat2, _constrain_lng(lng + math.atan2(sinlon, coslon)))


_FACE_CENTER_VEC = tuple(_geo_to_vec3(lat, lng) for lat, lng in FACE_CENTER_GEO)


def _nearest_face(lat: float, lng: float) -> int:
    v = _geo_to_vec3(lat, lng)
    best, bd = 0, -2.0
    for f in range(20):
        fv = _FACE_CENTER_VEC[f]
        d = v[0] * fv[0] + v[1] * fv[1] + v[2] * fv[2]
        if d > bd:
            best, bd = f, d
    return best


# -- per-face gnomonic projection -------------------------------------------


def _geo_to_hex2d(lat: float, lng: float, res: int, face: int) -> tuple:
    flat, flng = FACE_CENTER_GEO[face]
    v = _geo_to_vec3(lat, lng)
    fv = _FACE_CENTER_VEC[face]
    # libh3 _geoToHex2d derives r from the squared CHORD distance:
    # r = acos(1 - sqd/2) — same value as acos(dot) but different rounding;
    # kept operation-faithful for bit-exact vertex output
    sqd = (
        (v[0] - fv[0]) ** 2 + (v[1] - fv[1]) ** 2 + (v[2] - fv[2]) ** 2
    )
    r = math.acos(max(-1.0, min(1.0, 1.0 - sqd / 2.0)))
    if r < 1e-16:
        return (0.0, 0.0)
    theta = _pos_angle(
        _pos_angle(FACE_AXES_AZ_I[face])
        - _pos_angle(_geo_azimuth(flat, flng, lat, lng))
    )
    if res % 2 == 1:  # Class III: rotate into the odd-res grid
        theta = _pos_angle(theta - M_AP7_ROT_RADS)
    r = math.tan(r) / RES0_U_GNOMONIC
    for _ in range(res):
        r *= M_SQRT7
    return (r * math.cos(theta), r * math.sin(theta))


def _hex2d_to_geo(x: float, y: float, res: int, face: int,
                  substrate: bool = False) -> tuple:
    r = math.sqrt(x * x + y * y)  # _v2dMag — not hypot(); rounding must match
    flat, flng = FACE_CENTER_GEO[face]
    if r < 1e-16:
        return (flat, flng)
    theta = math.atan2(y, x)
    for _ in range(res):
        r /= M_SQRT7
    if substrate:
        r /= 3.0
        if res % 2 == 1:
            r /= M_SQRT7
    r = math.atan(r * RES0_U_GNOMONIC)
    if not substrate and res % 2 == 1:
        theta = _pos_angle(theta + M_AP7_ROT_RADS)
    az = _pos_angle(_pos_angle(FACE_AXES_AZ_I[face]) - theta)
    return _az_dist_to_geo(flat, flng, az, r)


# -- CoordIJK integer hex math ----------------------------------------------

_UNIT_VECS = (
    (0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
    (1, 0, 0), (1, 0, 1), (1, 1, 0),
)


def _ijk_normalize(i: int, j: int, k: int) -> tuple:
    if i < 0:
        j -= i
        k -= i
        i = 0
    if j < 0:
        i -= j
        k -= j
        j = 0
    if k < 0:
        i -= k
        j -= k
        k = 0
    m = min(i, j, k)
    return (i - m, j - m, k - m)


def _ijk_to_hex2d(i: int, j: int, k: int) -> tuple:
    i2 = i - k
    j2 = j - k
    return (i2 - 0.5 * j2, j2 * M_SIN60)


def _hex2d_to_ijk(x: float, y: float) -> tuple:
    """Nearest hex center (exact Voronoi rounding over lattice candidates)."""
    x2 = y / M_SIN60
    x1 = x + x2 / 2.0
    m1, m2 = math.floor(x1), math.floor(x2)
    best, bd = (0, 0), float("inf")
    for di in (0, 1, -1):
        for dj in (0, 1, -1):
            ci, cj = m1 + di, m2 + dj
            cx = ci - 0.5 * cj
            cy = cj * M_SIN60
            d = (cx - x) ** 2 + (cy - y) ** 2
            if d < bd - 1e-15:
                best, bd = (ci, cj), d
    return _ijk_normalize(best[0], best[1], 0)


def _up_ap7(i: int, j: int, k: int) -> tuple:
    i2, j2 = i - k, j - k
    return _ijk_normalize(
        round((3 * i2 - j2) / 7.0), round((i2 + 2 * j2) / 7.0), 0
    )


def _up_ap7r(i: int, j: int, k: int) -> tuple:
    i2, j2 = i - k, j - k
    return _ijk_normalize(
        round((2 * i2 + j2) / 7.0), round((3 * j2 - i2) / 7.0), 0
    )


def _down_ap7(i: int, j: int, k: int) -> tuple:
    return _ijk_normalize(3 * i + j, 3 * j + k, i + 3 * k)


def _down_ap7r(i: int, j: int, k: int) -> tuple:
    return _ijk_normalize(3 * i + k, i + 3 * j, j + 3 * k)


def _ijk_add(a, b) -> tuple:
    return _ijk_normalize(a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _ijk_sub(a, b) -> tuple:
    return _ijk_normalize(a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _ijk_scale(a, f: int) -> tuple:
    return (a[0] * f, a[1] * f, a[2] * f)


def _ijk_rotate60_ccw(i: int, j: int, k: int) -> tuple:
    return _ijk_normalize(i + k, i + j, j + k)


def _ijk_rotate60_cw(i: int, j: int, k: int) -> tuple:
    return _ijk_normalize(i + j, j + k, i + k)


def _unit_ijk_to_digit(ijk: tuple) -> int:
    n = _ijk_normalize(*ijk)
    for d, u in enumerate(_UNIT_VECS):
        if u == n:
            return d
    return -1


# -- H3 index bit helpers ----------------------------------------------------

_MODE_CELL = 1


def _make_h3(res: int, base_cell: int, digits) -> int:
    h = (_MODE_CELL << 59) | (res << 52) | (base_cell << 45)
    for r in range(1, MAX_RES + 1):
        d = digits[r - 1] if r <= res else 7
        h |= d << (45 - 3 * r)
    return h


def get_res(h: int) -> int:
    return (h >> 52) & 15


def get_base_cell(h: int) -> int:
    return (h >> 45) & 127


def is_pentagon(h: int) -> bool:
    return get_base_cell(h) in PENTAGON_CELLS and _leading_nonzero_digit(h) == 0


def _get_digit(h: int, r: int) -> int:
    return (h >> (45 - 3 * r)) & 7


def _set_digit(h: int, r: int, d: int) -> int:
    return (h & ~(7 << (45 - 3 * r))) | (d << (45 - 3 * r))


def _set_base_cell(h: int, bc: int) -> int:
    return (h & ~(127 << 45)) | (bc << 45)


def _leading_nonzero_digit(h: int) -> int:
    for r in range(1, get_res(h) + 1):
        d = _get_digit(h, r)
        if d:
            return d
    return 0


_ROT_CCW = {0: 0, 1: 5, 5: 4, 4: 6, 6: 2, 2: 3, 3: 1}
_ROT_CW = {0: 0, 1: 3, 3: 2, 2: 6, 6: 4, 4: 5, 5: 1}


def _h3_rotate60_ccw(h: int) -> int:
    for r in range(1, get_res(h) + 1):
        h = _set_digit(h, r, _ROT_CCW[_get_digit(h, r)])
    return h


def _h3_rotate60_cw(h: int) -> int:
    for r in range(1, get_res(h) + 1):
        h = _set_digit(h, r, _ROT_CW[_get_digit(h, r)])
    return h


def _h3_rotate_pent60_ccw(h: int) -> int:
    found = False
    for r in range(1, get_res(h) + 1):
        h = _set_digit(h, r, _ROT_CCW[_get_digit(h, r)])
        if not found and _get_digit(h, r) != 0:
            found = True
            if _leading_nonzero_digit(h) == 1:
                h = _h3_rotate60_ccw(h)
    return h


def _h3_rotate_pent60_cw(h: int) -> int:
    found = False
    for r in range(1, get_res(h) + 1):
        h = _set_digit(h, r, _ROT_CW[_get_digit(h, r)])
        if not found and _get_digit(h, r) != 0:
            found = True
            if _leading_nonzero_digit(h) == 1:
                h = _h3_rotate60_cw(h)
    return h


# -- derived geometry: base cell centers, face adjacency, overage motions ----

_BASE_CELL_GEO: list = [None] * NUM_BASE_CELLS
_BASE_CELL_VEC: list = [None] * NUM_BASE_CELLS
for _bc, (_f, _ijk, _p, _cw) in enumerate(BASE_CELL_DATA):
    _x, _y = _ijk_to_hex2d(*_ijk)
    _g = _hex2d_to_geo(_x, _y, 0, _f)
    _BASE_CELL_GEO[_bc] = _g
    _BASE_CELL_VEC[_bc] = _geo_to_vec3(*_g)


def _nearest_base_cell(lat: float, lng: float) -> int:
    v = _geo_to_vec3(lat, lng)
    best, bd = 0, -2.0
    for bc in range(NUM_BASE_CELLS):
        w = _BASE_CELL_VEC[bc]
        d = v[0] * w[0] + v[1] * w[1] + v[2] * w[2]
        if d > bd:
            best, bd = bc, d
    return best


_VERT_IJK = ((2, 0, 0), (0, 2, 0), (0, 0, 2))
_FACE_VERT_GEO: list = []
for _f in range(20):
    _vs = []
    for _vijk in _VERT_IJK:
        _x, _y = _ijk_to_hex2d(*_vijk)
        _vs.append(_hex2d_to_geo(_x, _y, 0, _f))
    _FACE_VERT_GEO.append(_vs)


def _same_geo(a: tuple, b: tuple) -> bool:
    return _geo_dist_rads(a[0], a[1], b[0], b[1]) < 1e-9


def _fit_rigid_hex_motion(src_pts, dst_pts):
    """rot60_ccw^k then translate, mapping both src ijk points to dst."""
    for rot_k in range(6):
        rots = []
        for s in src_pts:
            p = s
            for _ in range(rot_k):
                p = _ijk_rotate60_ccw(*p)
            rots.append(p)
        t = tuple(d - r for d, r in zip(dst_pts[0], rots[0]))
        ok = all(
            _ijk_normalize(r[0] + t[0], r[1] + t[1], r[2] + t[2])
            == _ijk_normalize(*d)
            for r, d in zip(rots, dst_pts)
        )
        if ok:
            return rot_k, t
    return None


# quadrant name -> local vertex pair flanking that edge:
#   "jk" overflow (j>0, k>0), "ki" (k>0, j==0), "ij" (k==0)
_QUAD_PAIR = {"jk": frozenset((1, 2)), "ki": frozenset((2, 0)),
              "ij": frozenset((0, 1))}

# (face, quadrant) -> (neighbor_face, ccw_rot60, translate_ijk at res 0)
_OVERAGE: dict = {}
for _face in range(20):
    for _quad, _pair in _QUAD_PAIR.items():
        _match = None
        for _g in range(20):
            if _g == _face:
                continue
            _shared = [
                (fi, gi)
                for fi in _pair
                for gi in range(3)
                if _same_geo(_FACE_VERT_GEO[_face][fi], _FACE_VERT_GEO[_g][gi])
            ]
            if len(_shared) == 2:
                _match = (_g, _shared)
                break
        if _match is None:
            raise AssertionError(f"no neighbor across {_face}/{_quad}")
        _g, _shared = _match
        _fit = _fit_rigid_hex_motion(
            [_VERT_IJK[fi] for fi, _ in _shared],
            [_VERT_IJK[gi] for _, gi in _shared],
        )
        if _fit is None:
            raise AssertionError(f"no rigid motion {_face}->{_g}")
        _OVERAGE[(_face, _quad)] = (_g, _fit[0], _fit[1])


def _adjust_overage_class_ii(face: int, ijk: tuple, res: int,
                             pent_leading_4: bool, substrate: bool):
    """faceijk.c _adjustOverageClassII. Returns (overage, face, ijk) with
    overage 0=none, 1=face edge, 2=new face."""
    max_dim = 2 * 7 ** (res // 2)
    if substrate:
        max_dim *= 3
    s = ijk[0] + ijk[1] + ijk[2]
    if substrate and s == max_dim:
        return 1, face, ijk
    if s <= max_dim:
        return 0, face, ijk
    if ijk[2] > 0:
        if ijk[1] > 0:
            quad = "jk"
        else:
            quad = "ki"
            if pent_leading_4:
                # rotate out of the missing k-axes sub-sequence about the
                # pentagon vertex (maxDim, 0, 0)
                origin = (max_dim, 0, 0)
                t = (ijk[0] - origin[0], ijk[1] - origin[1], ijk[2] - origin[2])
                t = _ijk_rotate60_cw(*t)
                ijk = (t[0] + origin[0], t[1] + origin[1], t[2] + origin[2])
    else:
        quad = "ij"
    new_face, rot, trans = _OVERAGE[(face, quad)]
    for _ in range(rot):
        ijk = _ijk_rotate60_ccw(*ijk)
    unit_scale = 7 ** (res // 2)
    if substrate:
        unit_scale *= 3
    ijk = _ijk_normalize(
        ijk[0] + trans[0] * unit_scale,
        ijk[1] + trans[1] * unit_scale,
        ijk[2] + trans[2] * unit_scale,
    )
    overage = 2
    if substrate and ijk[0] + ijk[1] + ijk[2] == max_dim:
        overage = 1
    return overage, new_face, ijk


# face -> {res-0 ijk: (base_cell, ccw_rot60)} — H3's faceIjkBaseCells.
# Populated at module bottom (needs the index assembly + inverse path below).
_FACE_IJK_BASE: list = [dict() for _ in range(20)]


# -- geoToH3 -----------------------------------------------------------------


def _ijk_digit_chain(ijk: tuple, res: int):
    """Aperture-7 parent chain: returns (res-0 ancestor ijk, digits[1..res])."""
    digits = [0] * MAX_RES
    for r in range(res, 0, -1):
        last = ijk
        if r % 2 == 1:  # Class III
            ijk = _up_ap7(*ijk)
            center = _down_ap7(*ijk)
        else:
            ijk = _up_ap7r(*ijk)
            center = _down_ap7r(*ijk)
        digits[r - 1] = _unit_ijk_to_digit(_ijk_sub(last, center))
    return ijk, digits


def _assemble_h3(face: int, base_cell: int, num_rots: int, digits,
                 res: int) -> int:
    h = _make_h3(res, base_cell, digits)
    if base_cell in PENTAGON_CELLS:
        # force rotation out of the missing k-axes sub-sequence
        if _leading_nonzero_digit(h) == 1:
            if face in BASE_CELL_DATA[base_cell][3]:  # cw offset face
                h = _h3_rotate60_cw(h)
            else:
                h = _h3_rotate60_ccw(h)
        for _ in range(num_rots):
            h = _h3_rotate_pent60_ccw(h)
    else:
        for _ in range(num_rots):
            h = _h3_rotate60_ccw(h)
    return h


def _face_ijk_to_h3(face: int, ijk: tuple, res: int) -> int:
    ijk0, digits = _ijk_digit_chain(ijk, res)
    entry = _FACE_IJK_BASE[face].get(ijk0)
    if entry is None:
        raise AssertionError(f"no base cell at face {face} ijk {ijk0}")
    return _assemble_h3(face, entry[0], entry[1], digits, res)


def geo_to_h3(lat_deg: float, lng_deg: float, res: int) -> int:
    """H3 index of the cell containing (lat, lng) at `res`.

    (ClickHouse's SQL surface is geoToH3(lon, lat, res) — callers swap.)"""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"h3 resolution out of range: {res}")
    lat = math.radians(lat_deg)
    lng = math.radians(lng_deg)
    face = _nearest_face(lat, lng)
    x, y = _geo_to_hex2d(lat, lng, res, face)
    ijk = _hex2d_to_ijk(x, y)
    return _face_ijk_to_h3(face, ijk, res)


# -- h3ToGeo -----------------------------------------------------------------


def _h3_to_face_ijk(h: int):
    """h3Index.c _h3ToFaceIjk: (face, ijk) of the cell center at its res."""
    base_cell = get_base_cell(h)
    if base_cell >= NUM_BASE_CELLS:
        # garbage index — stable junk instead of the reference's OOB read
        base_cell %= NUM_BASE_CELLS
        h = _set_base_cell(h, base_cell)
    if base_cell in PENTAGON_CELLS and _leading_nonzero_digit(h) == 5:
        h = _h3_rotate60_cw(h)
    face, ijk0, _pent, _cw = BASE_CELL_DATA[base_cell]
    ijk = tuple(ijk0)
    res = get_res(h)
    possible_overage = True
    if base_cell not in PENTAGON_CELLS and (
        res == 0 or ijk == (0, 0, 0)
    ):
        possible_overage = False
    for r in range(1, res + 1):
        if r % 2 == 1:  # Class III
            ijk = _down_ap7(*ijk)
        else:
            ijk = _down_ap7r(*ijk)
        # % 7 guards garbage indexes whose "digits" are the 7-padding
        # (libh3 reads unitVecs[] out of bounds there; we stay stable)
        ijk = _ijk_add(ijk, _UNIT_VECS[_get_digit(h, r) % 7])
    if not possible_overage:
        return face, ijk, res
    orig = ijk
    adj_res = res
    if res % 2 == 1:
        ijk = _down_ap7r(*ijk)
        adj_res = res + 1
    pent_leading_4 = (
        base_cell in PENTAGON_CELLS and _leading_nonzero_digit(h) == 4
    )
    ov, face2, ijk2 = _adjust_overage_class_ii(
        face, ijk, adj_res, pent_leading_4, False
    )
    if ov == 2:
        if base_cell in PENTAGON_CELLS:
            while True:
                ov2, face2, ijk2 = _adjust_overage_class_ii(
                    face2, ijk2, adj_res, False, False
                )
                if ov2 != 2:
                    break
        if adj_res != res:
            ijk2 = _up_ap7r(*ijk2)
        return face2, ijk2, res
    return face, orig, res


def h3_to_geo(h: int) -> tuple:
    """Cell center as (lat_deg, lng_deg)."""
    face, ijk, res = _h3_to_face_ijk(h)
    x, y = _ijk_to_hex2d(*ijk)
    lat, lng = _hex2d_to_geo(x, y, res, face)
    return (math.degrees(lat), math.degrees(lng))


# -- derive _FACE_IJK_BASE (H3's faceIjkBaseCells) ---------------------------
#
# Matching: fold each face-grid point onto the adjacent face until inside,
# then require exact coincidence with a base cell center.
# Rotation: probe-calibrated — pick an interior point q whose res-0 ancestor
# is this grid point, assemble the res-3 index under each candidate rotation,
# and keep the one whose table-free inverse (_h3_to_face_ijk uses only
# BASE_CELL_DATA + _OVERAGE) round-trips to q's cell. Knife-edge entries no
# interior probe can reach get the rotation by composing the fold rotation
# with the folded position's entry.

def _derive_face_ijk_base() -> None:
    res3_radius = 0.012  # rads; res-3 hex circumradius is ~0.009

    def probe_rot(face: int, p: tuple, bc: int):
        if p == (0, 0, 0):
            return 0  # face-center cell: identity by definition
        x, y = _ijk_to_hex2d(*p)
        surviving = None
        n_probes = 0
        for c in (0.9, 0.8, 0.65, 0.5):
            for dth in (0.0, -0.22, 0.22, -0.4, 0.4):
                qx = (x * math.cos(dth) - y * math.sin(dth)) * c
                qy = (x * math.sin(dth) + y * math.cos(dth)) * c
                lat, lng = _hex2d_to_geo(qx, qy, 0, face)
                if _nearest_face(lat, lng) != face:
                    continue
                xx, yy = _geo_to_hex2d(lat, lng, 3, face)
                ijk = _hex2d_to_ijk(xx, yy)
                anc, digits = _ijk_digit_chain(ijk, 3)
                if anc != p:
                    continue
                hits = set()
                for rot in range(6):
                    h = _assemble_h3(face, bc, rot, digits, 3)
                    clat, clng = h3_to_geo(h)
                    if _geo_dist_rads(
                        math.radians(clat), math.radians(clng), lat, lng
                    ) < res3_radius:
                        hits.add(rot)
                if not hits:
                    continue
                n_probes += 1
                surviving = hits if surviving is None else surviving & hits
                if surviving and len(surviving) == 1 and n_probes >= 2:
                    return min(surviving)
        if not surviving:
            return None
        # several rotations are observationally identical over every probe
        # in this face's wedge (pentagon deleted-k aliasing): any works
        return min(surviving)

    deferred = []
    for face in range(20):
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    if min(i, j, k) > 0:
                        continue  # not normalized
                    p = (i, j, k)
                    f2, c2 = face, p
                    folds = 0
                    for _ in range(3):
                        ov, f2, c2 = _adjust_overage_class_ii(
                            f2, c2, 0, False, False
                        )
                        if ov != 2:
                            break
                        folds += 1
                    x, y = _ijk_to_hex2d(*c2)
                    lat, lng = _hex2d_to_geo(x, y, 0, f2)
                    bc = _nearest_base_cell(lat, lng)
                    blat, blng = _BASE_CELL_GEO[bc]
                    if _geo_dist_rads(lat, lng, blat, blng) > 1e-7:
                        continue  # grid point is not a base cell center
                    rot = probe_rot(face, p, bc)
                    if rot is None:
                        deferred.append((face, p, bc))
                    else:
                        _FACE_IJK_BASE[face][p] = (bc, rot)

    # resolve knife-edge entries by fold composition (a direction's angle
    # gains 60deg * fold_rot crossing the edge, so rotations add)
    for _ in range(3):
        still = []
        for face, p, bc in deferred:
            s = p[0] + p[1] + p[2]
            if p[2] > 0:
                quad = "jk" if p[1] > 0 else "ki"
            else:
                quad = "ij"
            if s <= 2:
                still.append((face, p, bc))
                continue
            g, fold_rot, trans = _OVERAGE[(face, quad)]
            q = p
            for _ in range(fold_rot):
                q = _ijk_rotate60_ccw(*q)
            q = _ijk_normalize(q[0] + trans[0], q[1] + trans[1], q[2] + trans[2])
            got = _FACE_IJK_BASE[g].get(q)
            if got is None:
                still.append((face, p, bc))
                continue
            if got[0] != bc:
                raise AssertionError(
                    f"fold mismatch at {face} {p}: {bc} vs {got[0]}"
                )
            _FACE_IJK_BASE[face][p] = (bc, (fold_rot + got[1]) % 6)
        deferred = still
        if not deferred:
            break
    if deferred:
        raise AssertionError(f"unresolved face ijk entries: {deferred}")


_derive_face_ijk_base()

# cross-check: every base cell's home placement must map back to itself
for _bc, (_f, _ijk, _p, _cw) in enumerate(BASE_CELL_DATA):
    _got = _FACE_IJK_BASE[_f].get(tuple(_ijk))
    if _got is None or _got[0] != _bc or _got[1] != 0:
        raise AssertionError(
            f"base cell table inconsistent: {_bc} home {_f}/{_ijk} -> {_got}"
        )


# -- grid traversal (kRing) --------------------------------------------------

# digit-stepping tables (H3's NEW_DIGIT_II/NEW_ADJUSTMENT_II and _III),
# derived from aperture-7 integer algebra: moving a child cell at digit d one
# unit in direction dir either stays in the parent (adjustment 0) or carries
# into the neighbor parent in direction `adj`.
_NEW_DIGIT: dict = {}      # (is_class_iii, d, dir) -> new digit
_NEW_ADJUSTMENT: dict = {}  # (is_class_iii, d, dir) -> parent carry direction


def _derive_digit_tables() -> None:
    for is_iii in (True, False):
        down = _down_ap7 if is_iii else _down_ap7r
        up = _up_ap7 if is_iii else _up_ap7r
        for d in range(7):
            for dr in range(1, 7):
                c = _ijk_add(_UNIT_VECS[d], _UNIT_VECS[dr])
                p = up(*c)
                nd = _unit_ijk_to_digit(_ijk_sub(c, down(*p)))
                adj = _unit_ijk_to_digit(p)
                if nd < 0 or adj < 0:
                    raise AssertionError(f"digit table: {is_iii} {d} {dr}")
                _NEW_DIGIT[(is_iii, d, dr)] = nd
                _NEW_ADJUSTMENT[(is_iii, d, dr)] = adj


_derive_digit_tables()

# base cell neighbors + frame rotations (H3's baseCellNeighbors /
# baseCellNeighbor60CCWRots), derived: step the home placement one res-0
# unit, fold onto the adjacent face if it overflows, and look the result up
# in the derived face->base-cell table. Pentagons have no K neighbor.
_BASE_NEIGHBORS: dict = {}  # (bc, dir) -> (neighbor_bc, ccw_rot60) | None


def _fold_res0(face: int, ijk: tuple):
    """Fold a res-0 grid point onto the owning face, tracking the total ccw
    frame rotation the folds apply (the piece _adjust_overage_class_ii
    performs but does not report)."""
    rot_total = 0
    for _ in range(4):
        if ijk[0] + ijk[1] + ijk[2] <= 2:  # res-0 max_dim
            return face, ijk, rot_total
        if ijk[2] > 0:
            quad = "jk" if ijk[1] > 0 else "ki"
        else:
            quad = "ij"
        nf, rot, trans = _OVERAGE[(face, quad)]
        for _ in range(rot):
            ijk = _ijk_rotate60_ccw(*ijk)
        ijk = _ijk_normalize(
            ijk[0] + trans[0], ijk[1] + trans[1], ijk[2] + trans[2]
        )
        face, rot_total = nf, (rot_total + rot) % 6
    raise AssertionError(f"unfoldable res-0 point {face} {ijk}")


def _derive_base_neighbors() -> None:
    for bc in range(NUM_BASE_CELLS):
        f, ijk0, _pent, _cw = BASE_CELL_DATA[bc]
        _BASE_NEIGHBORS[(bc, 0)] = (bc, 0)
        for dr in range(1, 7):
            if bc in PENTAGON_CELLS and dr == 1:
                _BASE_NEIGHBORS[(bc, dr)] = None  # deleted K neighbor
                continue
            p = _ijk_add(ijk0, _UNIT_VECS[dr])
            # the total frame rotation bc -> neighbor is the fold rotation
            # (home face frame -> owning face frame) composed with the
            # owning face's entry rotation (face frame -> canonical frame)
            f2, c2, fold_rot = _fold_res0(f, p)
            got = _FACE_IJK_BASE[f2].get(c2)
            if got is None:
                raise AssertionError(f"no neighbor for bc {bc} dir {dr}")
            _BASE_NEIGHBORS[(bc, dr)] = (got[0], (fold_rot + got[1]) % 6)


_derive_base_neighbors()

# Pentagon IK-direction corrections (tools/h3_calibrate.py): the hex fold in
# _fold_res0 crosses the pentagon's deleted k-subsequence for direction 5
# (IK) of each of the 12 pentagon base cells, landing one frame off. These
# entries were re-derived by probing res-2 cells whose digit walk exits
# through each entry and brute-forcing the unique (neighbor, ccw_rot60) that
# reproduces the exact-snap geometric neighbors; every other derived entry
# (708/720) validates as-is.
_BASE_NEIGHBOR_PATCH = {
    (4, 5): (0, 4),
    (14, 5): (20, 2),
    (24, 5): (23, 2),
    (38, 5): (47, 2),
    (49, 5): (48, 2),
    (58, 5): (65, 2),
    (63, 5): (59, 2),
    (72, 5): (60, 2),
    (83, 5): (87, 2),
    (97, 5): (89, 2),
    (107, 5): (104, 2),
    (117, 5): (121, 4),
}
_BASE_NEIGHBORS.update(_BASE_NEIGHBOR_PATCH)


class PentagonDistortion(Exception):
    """Raised stepping into a pentagon's deleted K sub-sequence."""


def _h3_neighbor_rotations(origin: int, direction: int, rotations: int):
    """algos.c h3NeighborRotations: (neighbor index, updated rotations)."""
    current = origin
    for _ in range(rotations):
        direction = _ROT_CCW[direction]
    new_rotations = 0
    old_base_cell = get_base_cell(current)
    old_leading = _leading_nonzero_digit(current)
    r = get_res(current) - 1
    while True:
        if r == -1:
            nb = _BASE_NEIGHBORS[(old_base_cell, direction)]
            if nb is None:
                # deleted K neighbor: this edge borders the IK neighbor
                nb = _BASE_NEIGHBORS[(old_base_cell, 5)]
                current = _h3_rotate60_ccw(current)
                rotations += 1
            current = _set_base_cell(current, nb[0])
            new_rotations = nb[1]
            break
        old_digit = _get_digit(current, r + 1)
        is_iii = (r + 1) % 2 == 1
        current = _set_digit(
            current, r + 1, _NEW_DIGIT[(is_iii, old_digit, direction)]
        )
        next_dir = _NEW_ADJUSTMENT[(is_iii, old_digit, direction)]
        if next_dir == 0:
            break
        direction = next_dir
        r -= 1
    new_base_cell = get_base_cell(current)
    if new_base_cell in PENTAGON_CELLS:
        already_adjusted = False
        if _leading_nonzero_digit(current) == 1:  # K axes
            if old_base_cell != new_base_cell:
                # traversed into the deleted k subsequence from a
                # different base cell: rotate out (cw on cw-offset faces)
                if BASE_CELL_DATA[old_base_cell][0] in \
                        BASE_CELL_DATA[new_base_cell][3]:
                    current = _h3_rotate60_cw(current)
                else:
                    current = _h3_rotate60_ccw(current)
                already_adjusted = True
            else:
                if old_leading == 0:
                    raise PentagonDistortion("K direction from pentagon")
                elif old_leading == 3:  # JK
                    current = _h3_rotate60_ccw(current)
                    rotations += 1
                elif old_leading == 5:  # IK
                    current = _h3_rotate60_cw(current)
                    rotations += 5
                else:
                    raise PentagonDistortion("unexpected pentagon path")
        for _ in range(new_rotations):
            current = _h3_rotate_pent60_ccw(current)
        if old_base_cell != new_base_cell:
            if new_base_cell in POLAR_PENTAGONS:
                # polar pentagons have all-i neighbors
                if old_base_cell not in (118, 8) and \
                        _leading_nonzero_digit(current) != 3:
                    rotations += 1
            elif _leading_nonzero_digit(current) == 5 and not already_adjusted:
                # distortion on the 5 neighbors bordering a pentagon
                rotations += 1
    else:
        for _ in range(new_rotations):
            current = _h3_rotate60_ccw(current)
    return current, (rotations + new_rotations) % 6


# ring traversal directions (algos.c DIRECTIONS / NEXT_RING_DIRECTION)
_RING_DIRECTIONS = (2, 3, 1, 5, 4, 6)  # J, JK, K, IK, I, IJ
_NEXT_RING_DIRECTION = 4  # I


def k_ring(origin: int, k: int) -> list:
    """All cells within grid distance k. Spiral (hexRange) order for the
    plain-hexagon case — matching libh3's kRing; when a pentagon disturbs
    the spiral, libh3 v3 falls back to a hash-table recursion
    (algos.c _kRingInternal) whose OUTPUT ORDER is the hash-slot order —
    reproduced exactly here so unsorted golden outputs match bit-for-bit."""
    if k < 0:
        raise ValueError("k must be non-negative")
    if get_base_cell(origin) >= NUM_BASE_CELLS:
        # garbage index (libh3 reads out-of-bounds here and returns junk;
        # the reference's buffer-overflow tests only require no crash)
        return [origin]
    try:
        out = [origin]
        if is_pentagon(origin):
            raise PentagonDistortion("pentagon origin")
        current = origin
        rotations = 0
        ring, direction, i = 1, 0, 0
        while ring <= k:
            if direction == 0 and i == 0:
                current, rotations = _h3_neighbor_rotations(
                    current, _NEXT_RING_DIRECTION, rotations
                )
                if is_pentagon(current):
                    raise PentagonDistortion("pentagon in ring")
            current, rotations = _h3_neighbor_rotations(
                current, _RING_DIRECTIONS[direction], rotations
            )
            out.append(current)
            i += 1
            if i == ring:
                i = 0
                direction += 1
                if direction == 6:
                    direction = 0
                    ring += 1
            if is_pentagon(current):
                raise PentagonDistortion("pentagon in ring")
        return out
    except PentagonDistortion:
        pass
    return _k_ring_internal_v3(origin, k)


def _k_ring_internal_v3(origin: int, k: int) -> list:
    """libh3 v3 algos.c _kRingInternal: depth-first distance flood into a
    linear-probed hash table of maxKringSize(k) slots keyed by index %
    table_size; output is the non-empty slots in table order (this order is
    what ClickHouse prints for kRings containing a pentagon)."""
    max_idx = 3 * k * (k + 1) + 1  # maxKringSize
    out = [0] * max_idx
    dist = [0] * max_idx
    # explicit stack; re-push on distance improvement like the recursion
    stack = [(origin, 0)]
    while stack:
        o, cur_k = stack.pop()
        off = o % max_idx
        while out[off] != 0 and out[off] != o:
            off = (off + 1) % max_idx
        if out[off] == o and dist[off] <= cur_k:
            continue
        out[off] = o
        dist[off] = cur_k
        if cur_k >= k:
            continue
        # recursion order: DIRECTIONS[0..5]; a stack pops LIFO, so push
        # reversed to preserve libh3's depth-first visit order
        for dr in reversed(_RING_DIRECTIONS):
            try:
                nb, _ = _h3_neighbor_rotations(o, dr, 0)
            except PentagonDistortion:
                continue  # h3NeighborRotations -> H3_NULL
            stack.append((nb, cur_k + 1))
    return [c for c in out if c != 0]


# -- cell boundary (h3ToGeoBoundary) -----------------------------------------
#
# faceijk.c _faceIjkToCellBoundary / _faceIjkPentToCellBoundary: cell
# vertices live on a substrate grid (aperture 3 + 3r, plus 7r for Class III
# to land back on Class II); each vertex is overage-adjusted onto its owning
# face and inverse-projected. Class III cell edges can cross icosahedron
# edges, introducing an extra intersection vertex per crossing.

# substrate aperture-3 unit vectors (coordijk.c _downAp3 / _downAp3r);
# self-check below: ap3 then ap3r must equal scaling by 3


def _down_ap3(i: int, j: int, k: int) -> tuple:
    return _ijk_normalize(2 * i + j, 2 * j + k, i + 2 * k)


def _down_ap3r(i: int, j: int, k: int) -> tuple:
    return _ijk_normalize(2 * i + k, i + 2 * j, j + 2 * k)


assert _down_ap3r(*_down_ap3(1, 0, 0)) == (3, 0, 0)
assert _down_ap3r(*_down_ap3(0, 1, 0)) == (0, 3, 0)

# cell vertices ccw from the i-axis, substrate coords (faceijk.c
# vertsCII/vertsCIII; pentagon drops the deleted-k vertex)
_VERTS_CII = ((2, 1, 0), (1, 2, 0), (0, 2, 1), (0, 1, 2), (1, 0, 2), (2, 0, 1))
_VERTS_CIII = ((5, 4, 0), (1, 5, 0), (0, 5, 4), (0, 1, 5), (4, 0, 5), (5, 0, 1))
# pentagon vertex order pinned by the reference's h3GetFaces hash-slot
# output (02223): iteration starts one vertex past the i-axis
_PENT_VERTS_CII = ((1, 2, 0), (0, 2, 1), (0, 1, 2), (1, 0, 2), (2, 1, 0))
_PENT_VERTS_CIII = ((1, 5, 0), (0, 5, 4), (0, 1, 5), (4, 0, 5), (5, 4, 0))

# (faceA, faceB adjacent) -> quad ('ij'/'jk'/'ki') of faceA's edge toward B
_ADJ_FACE_DIR = {
    (f, nf): quad for (f, quad), (nf, _r, _t) in _OVERAGE.items()
}


def _v2d_intersect(p0, p1, p2, p3) -> tuple:
    s1 = (p1[0] - p0[0], p1[1] - p0[1])
    s2 = (p3[0] - p2[0], p3[1] - p2[1])
    t = (s2[0] * (p0[1] - p2[1]) - s2[1] * (p0[0] - p2[0])) / (
        -s2[0] * s1[1] + s1[0] * s2[1]
    )
    return (p0[0] + t * s1[0], p0[1] + t * s1[1])


def _v2d_eq(a, b) -> bool:
    return abs(a[0] - b[0]) < 1e-9 and abs(a[1] - b[1]) < 1e-9


def _icosa_edge(center_face: int, other_face: int, max_dim: int):
    """Substrate 2d endpoints of center_face's edge toward other_face."""
    v0 = (3.0 * max_dim, 0.0)
    v1 = (-1.5 * max_dim, 3.0 * M_SIN60 * max_dim)
    v2 = (-1.5 * max_dim, -3.0 * M_SIN60 * max_dim)
    quad = _ADJ_FACE_DIR.get((center_face, other_face))
    if quad == "ij":
        return v0, v1
    if quad == "jk":
        return v1, v2
    return v2, v0  # 'ki'


def h3_to_geo_boundary(h: int) -> list:
    """Cell boundary as [(lat_deg, lng_deg), ...] — matches libh3's
    cellToBoundary vertex order (ccw starting from the i-axis vertex) and
    Class III icosahedron-edge intersection vertices."""
    face, ijk, res = _h3_to_face_ijk(h)
    if is_pentagon(h):
        return _pent_boundary(face, ijk, res)
    return _hex_boundary(face, ijk, res)


def _hex_boundary(face: int, ijk: tuple, res: int) -> list:
    adj_res = res
    center = _down_ap3r(*_down_ap3(*ijk))
    if res % 2 == 1:  # Class III -> substrate Class II
        center = _down_ap7r(*center)
        adj_res = res + 1
    verts_t = _VERTS_CIII if res % 2 == 1 else _VERTS_CII
    fijk_verts = [
        _ijk_normalize(center[0] + v[0], center[1] + v[1], center[2] + v[2])
        for v in verts_t
    ]
    max_dim = 2 * 7 ** (adj_res // 2)
    out: list = []
    last_face, last_overage = -1, 0
    for vert in range(7):  # extra pass to test the last edge
        v = vert % 6
        overage, f2, c2 = _adjust_overage_class_ii(
            face, fijk_verts[v], adj_res, False, True
        )
        if res % 2 == 1 and vert > 0 and f2 != last_face and last_overage != 1:
            last_v = (v + 5) % 6
            orig2d0 = _ijk_to_hex2d(*fijk_verts[last_v])
            orig2d1 = _ijk_to_hex2d(*fijk_verts[v])
            face2 = f2 if last_face == face else last_face
            e0, e1 = _icosa_edge(face, face2, max_dim)
            inter = _v2d_intersect(orig2d0, orig2d1, e0, e1)
            if not (_v2d_eq(orig2d0, inter) or _v2d_eq(orig2d1, inter)):
                out.append(
                    _hex2d_to_geo(inter[0], inter[1], adj_res, face, True)
                )
        if vert < 6:
            x, y = _ijk_to_hex2d(*c2)
            out.append(_hex2d_to_geo(x, y, adj_res, f2, True))
        last_face, last_overage = f2, overage
    return [(math.degrees(la), math.degrees(lo)) for la, lo in out]


def _pent_boundary(face: int, ijk: tuple, res: int) -> list:
    adj_res = res
    center = _down_ap3r(*_down_ap3(*ijk))
    if res % 2 == 1:
        center = _down_ap7r(*center)
        adj_res = res + 1
    verts_t = _PENT_VERTS_CIII if res % 2 == 1 else _PENT_VERTS_CII
    fijk_verts = [
        _ijk_normalize(center[0] + v[0], center[1] + v[1], center[2] + v[2])
        for v in verts_t
    ]
    max_dim = 2 * 7 ** (adj_res // 2)
    unit_scale = 7 ** (adj_res // 2) * 3

    def pent_vert_adjust(f, c):
        ov = 2
        while ov == 2:
            ov, f, c = _adjust_overage_class_ii(f, c, adj_res, False, True)
        return ov, f, c

    out: list = []
    last = None  # (face, coord) of the previous adjusted vertex
    for vert in range(6):  # 5 verts + closing-edge pass
        v = vert % 5
        ov, f2, c2 = pent_vert_adjust(face, fijk_verts[v])
        if res % 2 == 1 and vert > 0:
            # project the previous vertex onto THIS vertex's face, then
            # intersect the edge with the icosa edge between the two faces
            lf, lc = last
            orig2d0 = _ijk_to_hex2d(*lc)
            quad = _ADJ_FACE_DIR.get((f2, lf))
            if quad is not None:
                nf, rot, trans = _OVERAGE[(f2, quad)]
                cc = lc
                for _ in range(rot):
                    cc = _ijk_rotate60_ccw(*cc)
                cc = _ijk_normalize(
                    cc[0] + trans[0] * unit_scale,
                    cc[1] + trans[1] * unit_scale,
                    cc[2] + trans[2] * unit_scale,
                )
                orig2d0 = _ijk_to_hex2d(*cc)
                orig2d1 = _ijk_to_hex2d(*c2)
                e0, e1 = _icosa_edge(f2, lf, max_dim)
                inter = _v2d_intersect(orig2d0, orig2d1, e0, e1)
                out.append(
                    _hex2d_to_geo(inter[0], inter[1], adj_res, f2, True)
                )
        if vert < 5:
            x, y = _ijk_to_hex2d(*c2)
            out.append(_hex2d_to_geo(x, y, adj_res, f2, True))
        last = (f2, c2)
    return [(math.degrees(la), math.degrees(lo)) for la, lo in out]


def grid_disk_distances(origin: int, k: int) -> list:
    """(cell, distance) pairs within grid distance k (BFS; order by distance
    then index)."""
    dist = {origin: 0}
    frontier = [origin]
    for d in range(1, k + 1):
        nxt = []
        for c in frontier:
            for dr in range(1, 7):
                try:
                    nb, _ = _h3_neighbor_rotations(c, dr, 0)
                except PentagonDistortion:
                    continue
                if nb not in dist:
                    dist[nb] = d
                    nxt.append(nb)
        frontier = nxt
    return sorted(dist.items(), key=lambda t: (t[1], t[0]))


def are_neighbor_cells(a: int, b: int) -> bool:
    if a == b or get_res(a) != get_res(b):
        return False
    for dr in range(1, 7):
        try:
            nb, _ = _h3_neighbor_rotations(a, dr, 0)
        except PentagonDistortion:
            continue
        if nb == b:
            return True
    return False


def hex_ring(origin: int, k: int) -> list:
    """libh3 hexRing/gridRingUnsafe: the k-ring ONLY, spiral order; raises
    PentagonDistortion when the ring contains or crosses a pentagon."""
    if k == 0:
        return [origin]
    if get_base_cell(origin) >= NUM_BASE_CELLS:
        raise ValueError("hexRing: invalid origin")  # CH serverError 117
    if is_pentagon(origin):
        raise PentagonDistortion("pentagon origin")
    h = origin
    rotations = 0
    for _ in range(k):
        h, rotations = _h3_neighbor_rotations(
            h, _NEXT_RING_DIRECTION, rotations
        )
        if is_pentagon(h):
            raise PentagonDistortion("pentagon in ring")
    last_index = h
    out = [h]
    for direction in range(6):
        for pos in range(k):
            h, rotations = _h3_neighbor_rotations(
                h, _RING_DIRECTIONS[direction], rotations
            )
            if pos != k - 1 or direction != 5:
                out.append(h)
                if is_pentagon(h):
                    raise PentagonDistortion("pentagon in ring")
    if last_index != out[0]:
        raise PentagonDistortion("pentagonal distortion")
    return out


def grid_distance(a: int, b: int, cap: int = 1000) -> int:
    """Grid distance via expanding BFS from `a` (libh3 gridDistance
    semantics; -1 when unreachable/cap exceeded or resolutions differ)."""
    if get_res(a) != get_res(b):
        return -1
    if a == b:
        return 0
    dist = {a: 0}
    frontier = [a]
    for d in range(1, cap + 1):
        nxt = []
        for c in frontier:
            for dr in range(1, 7):
                try:
                    nb, _ = _h3_neighbor_rotations(c, dr, 0)
                except PentagonDistortion:
                    continue
                if nb == b:
                    return d
                if nb not in dist:
                    dist[nb] = d
                    nxt.append(nb)
        if not nxt:
            return -1
        frontier = nxt
    return -1


def grid_path(a: int, b: int, cap: int = 1000) -> list:
    """A shortest cell path from a to b inclusive (libh3 gridPathCells
    contract: length == gridDistance + 1; exact member cells may differ from
    libh3's local-ijk lerp, which tests only check by length)."""
    if get_res(a) != get_res(b):
        raise ValueError("resolution mismatch")
    if a == b:
        return [a]
    prev = {a: 0}
    frontier = [a]
    found = False
    for _ in range(cap):
        nxt = []
        for c in frontier:
            for dr in range(1, 7):
                try:
                    nb, _ = _h3_neighbor_rotations(c, dr, 0)
                except PentagonDistortion:
                    continue
                if nb not in prev:
                    prev[nb] = c
                    nxt.append(nb)
                    if nb == b:
                        found = True
        if found or not nxt:
            break
        frontier = nxt
    if not found:
        raise ValueError("no path")
    path = [b]
    while path[-1] != a:
        path.append(prev[path[-1]])
    path.reverse()
    return path


def get_faces(h: int) -> list:
    """Icosahedron faces the cell intersects, in libh3's output order: the
    vertex faces are inserted into a faceCount-slot hash array at
    face % faceCount with linear probing (h3Index.c h3GetFaces), and
    ClickHouse prints the non-empty slots in array order."""
    res = get_res(h)
    pent = is_pentagon(h)
    if pent and res % 2 == 0 and res < MAX_RES:
        # Class II pentagon vertices all lie ON icosahedron edges, which the
        # vertex-fold can't attribute to both faces; libh3 uses the center
        # child (Class III) which crosses the same faces
        child = _set_digit(h, res + 1, 0)
        child = (child & ~(15 << 52)) | ((res + 1) << 52)
        return get_faces(child)
    face, ijk, res = _h3_to_face_ijk(h)
    # vertex faces via the substrate fold (same machinery as the boundary)
    adj_res = res
    center = _down_ap3r(*_down_ap3(*ijk))
    if res % 2 == 1:
        center = _down_ap7r(*center)
        adj_res = res + 1
    if pent:
        verts_t = _PENT_VERTS_CIII if res % 2 == 1 else _PENT_VERTS_CII
    else:
        verts_t = _VERTS_CIII if res % 2 == 1 else _VERTS_CII
    face_count = 5 if pent else 2  # maxFaceCount
    slots = [None] * face_count
    for v in verts_t:
        c = _ijk_normalize(center[0] + v[0], center[1] + v[1], center[2] + v[2])
        ov, f2, c2 = 2, face, c
        if pent:
            while ov == 2:
                ov, f2, c2 = _adjust_overage_class_ii(
                    f2, c2, adj_res, False, True
                )
        else:
            ov, f2, c2 = _adjust_overage_class_ii(f2, c2, adj_res, False, True)
        pos = f2 % face_count
        while slots[pos] is not None and slots[pos] != f2:
            pos = (pos + 1) % face_count
        slots[pos] = f2
    return [f for f in slots if f is not None]


def _tri_area_rads2(a, b, c) -> float:
    """Spherical triangle area via l'Huilier (libh3 triangleEdgeLengthsToArea)
    from three (lat, lng) radian points."""
    ab = _geo_dist_rads(a[0], a[1], b[0], b[1])
    bc = _geo_dist_rads(b[0], b[1], c[0], c[1])
    ca = _geo_dist_rads(c[0], c[1], a[0], a[1])
    s = (ab + bc + ca) / 2.0
    t = (
        math.tan(s / 2.0)
        * math.tan((s - ab) / 2.0)
        * math.tan((s - bc) / 2.0)
        * math.tan((s - ca) / 2.0)
    )
    return 4.0 * math.atan(math.sqrt(max(0.0, t)))


def cell_area_rads2(h: int) -> float:
    """libh3 cellAreaRads2: fan of spherical triangles from the center."""
    clat, clng = (math.radians(v) for v in h3_to_geo(h))
    verts = [
        (math.radians(a), math.radians(o)) for a, o in h3_to_geo_boundary(h)
    ]
    total = 0.0
    n = len(verts)
    for i in range(n):
        total += _tri_area_rads2(verts[i], verts[(i + 1) % n], (clat, clng))
    return total


# -- directed (unidirectional) edges ------------------------------------------

_MODE_EDGE = 2


def edge_origin(e: int) -> int:
    """Clear the direction bits and set cell mode (pure bit math — the
    reference returns 0 only when the mode is not edge-mode)."""
    if (e >> 59) & 15 != _MODE_EDGE:
        return 0
    cleared = e & ~(7 << 56)
    return (cleared & ~(15 << 59)) | (_MODE_CELL << 59)


def edge_direction(e: int) -> int:
    return (e >> 56) & 7


def edge_destination(e: int) -> int:
    origin = edge_origin(e)
    if origin == 0:
        return 0
    try:
        nb, _ = _h3_neighbor_rotations(origin, edge_direction(e), 0)
    except PentagonDistortion:
        return 0
    return nb


def cells_to_edge(a: int, b: int) -> int:
    """Edge index from origin a to neighboring cell b (0 if not neighbors)."""
    for dr in range(1, 7):
        try:
            nb, _ = _h3_neighbor_rotations(a, dr, 0)
        except PentagonDistortion:
            continue
        if nb == b:
            return (a & ~(15 << 59)) | (_MODE_EDGE << 59) | (dr << 56)
    return 0


def edges_from_cell(h: int) -> list:
    """All six directed edges of a cell (pure bit math like the reference;
    a pentagon's deleted-k edge is emitted as 0)."""
    base = (h & ~(15 << 59) & ~(7 << 56)) | (_MODE_EDGE << 59)
    out = []
    for dr in range(1, 7):
        if dr == 1 and is_pentagon(h):
            out.append(0)
        else:
            out.append(base | (dr << 56))
    return out


def edge_is_valid(e: int) -> bool:
    if (e >> 59) & 15 != _MODE_EDGE:
        return False
    d = edge_direction(e)
    if not 1 <= d <= 6:
        return False
    origin = edge_origin(e)
    if d == 1 and is_pentagon(origin):
        return False
    return cell_is_valid(origin)


def cell_is_valid(h: int) -> bool:
    if (h >> 63) & 1 or (h >> 59) & 15 != _MODE_CELL or (h >> 56) & 7:
        return False
    bc = get_base_cell(h)
    if bc >= NUM_BASE_CELLS:
        return False
    res = get_res(h)
    leading_seen = False
    for r in range(1, MAX_RES + 1):
        d = _get_digit(h, r)
        if r <= res:
            if d == 7:
                return False
            if bc in PENTAGON_CELLS and not leading_seen and d == 1:
                return False
            if d:
                leading_seen = True
        elif d != 7:
            return False
    return True


def _boundary_with_flags(h: int) -> list:
    """Cell boundary as [(lat_deg, lng_deg, vert_idx_or_None)] where
    vert_idx labels true cell vertices (ccw) and None marks Class III
    icosahedron-edge intersection points."""
    pts = h3_to_geo_boundary(h)
    face, ijk, res = _h3_to_face_ijk(h)
    if is_pentagon(h):
        nvert = 5
    else:
        nvert = 6
    if len(pts) == nvert:
        return [(a, o, i) for i, (a, o) in enumerate(pts)]
    # recompute which entries are true vertices by matching against the
    # vertex-only projection (substrate verts, no intersections)
    adj_res = res
    center = _down_ap3r(*_down_ap3(*ijk))
    if res % 2 == 1:
        center = _down_ap7r(*center)
        adj_res = res + 1
    if is_pentagon(h):
        verts_t = _PENT_VERTS_CIII if res % 2 == 1 else _PENT_VERTS_CII
    else:
        verts_t = _VERTS_CIII if res % 2 == 1 else _VERTS_CII
    true_pts = []
    for v in verts_t:
        c = _ijk_normalize(center[0] + v[0], center[1] + v[1], center[2] + v[2])
        ov, f2, c2 = 2, face, c
        while ov == 2:
            ov, f2, c2 = _adjust_overage_class_ii(f2, c2, adj_res, False, True)
        x, y = _ijk_to_hex2d(*c2)
        la, lo = _hex2d_to_geo(x, y, adj_res, f2, True)
        true_pts.append((math.degrees(la), math.degrees(lo)))
    out = []
    for a, o in pts:
        idx = None
        for i, (ta, to) in enumerate(true_pts):
            if abs(a - ta) < 1e-9 and abs(o - to) < 1e-9:
                idx = i
                break
        out.append((a, o, idx))
    return out


def edge_boundary(e: int) -> list:
    """(lat_deg, lng_deg) points of a directed edge (libh3
    directedEdgeToBoundary): the two cell vertices flanking the edge toward
    the destination, plus any Class III intersection point between them,
    in ccw cell order."""
    origin = edge_origin(e)
    if origin == 0 or not edge_is_valid(e):
        return []
    dest = edge_destination(e)
    if dest == 0:
        return []
    dlat, dlng = (math.radians(v) for v in h3_to_geo(dest))
    pts = _boundary_with_flags(origin)
    n = len(pts)
    # true-vertex positions in the ring
    vidx = [i for i, p in enumerate(pts) if p[2] is not None]
    best, bd = None, float("inf")
    for j, i0 in enumerate(vidx):
        i1 = vidx[(j + 1) % len(vidx)]
        seg = []
        i = i0
        while True:
            seg.append(i)
            if i == i1:
                break
            i = (i + 1) % n
        mlat = sum(math.radians(pts[i][0]) for i in (i0, i1)) / 2
        mlng = sum(math.radians(pts[i][1]) for i in (i0, i1)) / 2
        d = _geo_dist_rads(mlat, mlng, dlat, dlng)
        if d < bd:
            best, bd = seg, d
    return [(pts[i][0], pts[i][1]) for i in best]


def edge_length_rads(e: int) -> float:
    pts = edge_boundary(e)
    total = 0.0
    for i in range(len(pts) - 1):
        total += _geo_dist_rads(
            math.radians(pts[i][0]), math.radians(pts[i][1]),
            math.radians(pts[i + 1][0]), math.radians(pts[i + 1][1]),
        )
    return total
