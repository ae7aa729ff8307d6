"""Pure-Python S2 cell-id geometry (leaf-cell subset).

Reference parity surface: src/Functions/geoToS2.cpp, s2ToGeo.cpp,
s2GetNeighbors.cpp, s2CellsIntersect.cpp, s2CapContains.cpp,
s2CapUnion.cpp, s2RectAdd.cpp, s2RectContains.cpp, s2RectUnion.cpp,
s2RectIntersection.cpp — each a thin wrapper over one s2geometry call.

The geometry here is re-derived from the public Apache-2.0 s2geometry
spec (quadratic ST projection on 6 cube faces + Hilbert curve ordering);
only the published constants (Hilbert sub-cell traversal orders
POS_TO_IJ / POS_TO_ORIENTATION, the quadratic UV<->ST transform, the
face<->XYZ axis assignment) are transcribed. The 4-bit lookup tables are
DERIVED at import from the 2x2 recursion, mirroring s2geometry's own
MaybeInit(). Validation is against the reference's stateless test
vectors (tests/queries/0_stateless/01849_geoToS2.sql, 01851-01854) in
tests/test_geo.py.

Like h3_core.py, this is a compat tier for the CH dialect and golden
tests (pandas-UDF per-row Python math), not a 100 TB data path — use the
JVM-native geohash tier for large-scale geo bucketing (SCALING.md).
"""

from __future__ import annotations

import math

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL

SWAP_MASK = 1
INVERT_MASK = 2
LOOKUP_BITS = 4

_U64 = (1 << 64) - 1

# Hilbert curve traversal order: POS_TO_IJ[orientation][position] gives the
# (i,j) sub-cell index (i*2+j) of the position-th visited sub-cell.
POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)

# 4-bit-deep lookup tables, derived from the 2x2 recursion at import
# (index layout identical to s2geometry's lookup_pos / lookup_ij).
_LOOKUP_POS = [0] * (1 << (2 * LOOKUP_BITS + 2))
_LOOKUP_IJ = [0] * (1 << (2 * LOOKUP_BITS + 2))


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orient
        _LOOKUP_IJ[(pos << 2) + orig] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = POS_TO_IJ[orient]
    for idx in range(4):
        _init_lookup(
            level,
            i + (r[idx] >> 1),
            j + (r[idx] & 1),
            orig,
            pos + idx,
            orient ^ POS_TO_ORIENTATION[idx],
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


# ---------------------------------------------------------------- projections

def _st_to_uv(s: float) -> float:
    # quadratic projection (S2_QUADRATIC_PROJECTION)
    if s >= 0.5:
        return (1.0 / 3.0) * (4.0 * s * s - 1.0)
    return (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))


def _uv_to_st(u: float) -> float:
    if u >= 0.0:
        return 0.5 * math.sqrt(1.0 + 3.0 * u)
    return 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)


def _st_to_ij(s: float) -> int:
    # FastIntRound(MAX_SIZE * s - 0.5), clamped — round half to even
    v = MAX_SIZE * s - 0.5
    r = round(v)  # Python round = banker's, matches SSE cvtsd2si
    return max(0, min(MAX_SIZE - 1, int(r)))


def _face_uv_to_xyz(face: int, u: float, v: float):
    if face == 0:
        return (1.0, u, v)
    if face == 1:
        return (-u, 1.0, v)
    if face == 2:
        return (-u, -v, 1.0)
    if face == 3:
        return (-1.0, -v, -u)
    if face == 4:
        return (v, -1.0, -u)
    return (v, u, -1.0)


def _xyz_to_face_uv(p):
    x, y, z = p
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        face = 0 if ax > az else 2
    else:
        face = 1 if ay > az else 2
    if face == 0 and x < 0:
        face = 3
    elif face == 1 and y < 0:
        face = 4
    elif face == 2 and z < 0:
        face = 5
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z
    return face, u, v


def _latlng_to_xyz(lat_deg: float, lng_deg: float):
    phi = math.radians(lat_deg)
    theta = math.radians(lng_deg)
    cosphi = math.cos(phi)
    return (cosphi * math.cos(theta), cosphi * math.sin(theta), math.sin(phi))


def _xyz_to_latlng(p):
    x, y, z = p
    lat = math.atan2(z, math.sqrt(x * x + y * y))
    lng = math.atan2(y, x)
    return math.degrees(lat), math.degrees(lng)


# --------------------------------------------------------------- cell id core

def from_face_ij(face: int, i: int, j: int) -> int:
    n = face << (POS_BITS - 1)
    bits = face & SWAP_MASK
    mask = (1 << LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2)
        bits += ((j >> (k * LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2) << (k * 2 * LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    return (n * 2 + 1) & _U64


def to_face_ij(cell: int):
    """Return (face, i, j, orientation) of a cell id."""
    face = cell >> POS_BITS
    bits = face & SWAP_MASK
    i = j = 0
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * LOOKUP_BITS if k == 7 else LOOKUP_BITS
        bits += ((cell >> (k * 2 * LOOKUP_BITS + 1)) & ((1 << (2 * nbits)) - 1)) << 2
        bits = _LOOKUP_IJ[bits]
        i += (bits >> (LOOKUP_BITS + 2)) << (k * LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << LOOKUP_BITS) - 1)) << (k * LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    return face, i, j, bits


def lsb(cell: int) -> int:
    return cell & ((~cell + 1) & _U64)


def is_valid(cell: int) -> bool:
    if cell < 0 or cell > _U64:
        return False
    return (cell >> POS_BITS) < 6 and (lsb(cell) & 0x1555555555555555) != 0


def is_leaf(cell: int) -> bool:
    return bool(cell & 1)


def level(cell: int) -> int:
    return MAX_LEVEL - ((lsb(cell).bit_length() - 1) >> 1)


def parent(cell: int, lev: int) -> int:
    new_lsb = 1 << (2 * (MAX_LEVEL - lev))
    return ((cell & ((~new_lsb + 1) & _U64)) | new_lsb) & _U64


def range_min(cell: int) -> int:
    return cell - (lsb(cell) - 1)


def range_max(cell: int) -> int:
    return cell + (lsb(cell) - 1)


def cell_to_xyz_raw(cell: int):
    """UNnormalized center point (ToPointRaw: GetCenterSiTi->FaceSiTitoXYZ).
    ToLatLng works on the raw point — normalizing first shifts the last
    ulp of the printed degrees (reference 01851 vector pins this)."""
    face, i, j, _ = to_face_ij(cell)
    if is_leaf(cell):
        delta = 1
    else:
        delta = 2 if ((i ^ (cell >> 2)) & 1) else 0
    si = 2 * i + delta
    ti = 2 * j + delta
    u = _st_to_uv((1.0 / (2 * MAX_SIZE)) * si)
    v = _st_to_uv((1.0 / (2 * MAX_SIZE)) * ti)
    return _face_uv_to_xyz(face, u, v)


def cell_to_xyz(cell: int):
    """Normalized center point (ToPoint) — cap/interpolation math."""
    p = cell_to_xyz_raw(cell)
    n = math.sqrt(p[0] * p[0] + p[1] * p[1] + p[2] * p[2])
    return (p[0] / n, p[1] / n, p[2] / n)


def xyz_to_cell(p) -> int:
    face, u, v = _xyz_to_face_uv(p)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    return from_face_ij(face, i, j)


def geo_to_s2(lon_deg: float, lat_deg: float) -> int:
    """geoToS2(lon, lat) -> leaf cell id (geoToS2.cpp:94-110)."""
    if math.isnan(lon_deg) or math.isnan(lat_deg):
        raise ValueError("Arguments must not be NaN")  # CH serverError 43
    if not (math.isfinite(lon_deg) and math.isfinite(lat_deg)):
        raise ValueError("Arguments must not be infinite")  # CH serverError 43
    return xyz_to_cell(_latlng_to_xyz(lat_deg, lon_deg))


def s2_to_geo(cell: int):
    """s2ToGeo(id) -> (lon, lat) degrees (s2ToGeo.cpp:96-106)."""
    if not is_valid(cell):
        raise ValueError("Point is not valid")  # CH serverError 36
    lat, lng = _xyz_to_latlng(cell_to_xyz_raw(cell))
    return lng, lat


# ---------------------------------------------------------------- neighbors

def _from_face_ij_wrap(face: int, i: int, j: int) -> int:
    i = max(-1, min(MAX_SIZE, i))
    j = max(-1, min(MAX_SIZE, j))
    scale = 1.0 / MAX_SIZE
    limit = 1.0 + 2.220446049250313e-16  # 1 + DBL_EPSILON
    u = max(-limit, min(limit, scale * (2 * (i - MAX_SIZE // 2) + 1)))
    v = max(-limit, min(limit, scale * (2 * (j - MAX_SIZE // 2) + 1)))
    face, u, v = _xyz_to_face_uv(_face_uv_to_xyz(face, u, v))
    return from_face_ij(face, _st_to_ij(0.5 * (u + 1)), _st_to_ij(0.5 * (v + 1)))


def _from_face_ij_same(face: int, i: int, j: int, same_face: bool) -> int:
    if same_face:
        return from_face_ij(face, i, j)
    return _from_face_ij_wrap(face, i, j)


def get_edge_neighbors(cell: int):
    """4 edge neighbors at the cell's own level (s2cellid GetEdgeNeighbors):
    order [down, right, up, left] as emitted by s2GetNeighbors.cpp."""
    if not is_valid(cell):
        raise ValueError("Invalid S2 index")  # CH serverError 36
    lev = level(cell)
    size = 1 << (MAX_LEVEL - lev)
    face, i, j, _ = to_face_ij(cell)
    return [
        parent(_from_face_ij_same(face, i, j - size, j - size >= 0), lev),
        parent(_from_face_ij_same(face, i + size, j, i + size < MAX_SIZE), lev),
        parent(_from_face_ij_same(face, i, j + size, j + size < MAX_SIZE), lev),
        parent(_from_face_ij_same(face, i - size, j, i - size >= 0), lev),
    ]


def cells_intersect(a: int, b: int) -> bool:
    """s2CellsIntersect.cpp:117-125 — validity-checked containment test."""
    if not is_valid(a) or not is_valid(b):
        raise ValueError("Cell is not valid")  # CH serverError 36
    return range_min(a) <= range_max(b) and range_max(a) >= range_min(b)


# ---------------------------------------------------------------- caps

def _chord_len2_from_degrees(deg: float) -> float:
    """S1ChordAngle(S1Angle::Degrees(deg)).length2()."""
    rad = math.radians(deg)
    if rad < 0:
        return -1.0
    if rad >= math.pi:
        return 4.0
    length = 2.0 * math.sin(0.5 * rad)
    return length * length


def _chord_len2_to_radians(len2: float) -> float:
    """S1ChordAngle::ToAngle().radians()."""
    if len2 < 0:
        return -1.0
    if len2 >= 4.0:
        return math.pi
    return 2.0 * math.asin(0.5 * math.sqrt(len2))


def _dist2(a, b) -> float:
    return (
        (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2
    )


def cap_contains(center_cell: int, degrees: float, point_cell: int) -> bool:
    """s2CapContains.cpp:138-152."""
    if math.isnan(degrees):
        raise ValueError("Radius of the cap must not be nan")  # 43
    if not is_valid(center_cell):
        raise ValueError("Cap center is not valid")  # 36
    if not is_valid(point_cell):
        raise ValueError("Point is not valid")  # 36
    len2 = _chord_len2_from_degrees(degrees)
    return _dist2(cell_to_xyz(center_cell), cell_to_xyz(point_cell)) <= len2


def _angle_between(a, b) -> float:
    cx = (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )
    cross_norm = math.sqrt(cx[0] ** 2 + cx[1] ** 2 + cx[2] ** 2)
    dot = a[0] * b[0] + a[1] * b[1] + a[2] * b[2]
    return math.atan2(cross_norm, dot)


def _interpolate_at_distance(ax: float, a, b):
    """S2::InterpolateAtDistance — rotate a toward b by ax radians."""
    # RobustCrossProd(a, b) = (b + a) x (b - a)  (= 2 a x b, exactly)
    s = (b[0] + a[0], b[1] + a[1], b[2] + a[2])
    d = (b[0] - a[0], b[1] - a[1], b[2] - a[2])
    nx = (
        s[1] * d[2] - s[2] * d[1],
        s[2] * d[0] - s[0] * d[2],
        s[0] * d[1] - s[1] * d[0],
    )
    nn = math.sqrt(nx[0] ** 2 + nx[1] ** 2 + nx[2] ** 2)
    normal = (nx[0] / nn, nx[1] / nn, nx[2] / nn)
    tangent = (
        normal[1] * a[2] - normal[2] * a[1],
        normal[2] * a[0] - normal[0] * a[2],
        normal[0] * a[1] - normal[1] * a[0],
    )
    c, si = math.cos(ax), math.sin(ax)
    r = (
        c * a[0] + si * tangent[0],
        c * a[1] + si * tangent[1],
        c * a[2] + si * tangent[2],
    )
    rn = math.sqrt(r[0] ** 2 + r[1] ** 2 + r[2] ** 2)
    return (r[0] / rn, r[1] / rn, r[2] / rn)


def cap_union(c1: int, r1_deg: float, c2: int, r2_deg: float):
    """s2CapUnion.cpp:150-165 -> (center_cell_id, radius_degrees).

    Mirrors S2Cap::Union: chord-angle compare for ordering, S1Angle math
    for the general case; radius surfaces via GetRadius().degrees(), so
    an empty cap prints -57.29577951308232 (chord -1 -> -1 rad)."""
    if math.isnan(r1_deg) or math.isnan(r2_deg):
        raise ValueError("Radius of the cap must not be nan")  # 43
    if not is_valid(c1) or not is_valid(c2):
        raise ValueError("Cap center is not valid")  # 36
    p1, l1 = cell_to_xyz(c1), _chord_len2_from_degrees(r1_deg)
    p2, l2 = cell_to_xyz(c2), _chord_len2_from_degrees(r2_deg)
    if l1 < l2:
        p1, l1, p2, l2 = p2, l2, p1, l1
    # is_full / other.is_empty
    if l1 >= 4.0 or l2 < 0:
        center, len2 = p1, l1
    else:
        ra = _chord_len2_to_radians(l1)
        rb = _chord_len2_to_radians(l2)
        dist = _angle_between(p1, p2)
        if ra >= dist + rb:
            center, len2 = p1, l1
        else:
            res_rad = 0.5 * (dist + ra + rb)
            center = _interpolate_at_distance(0.5 * (dist - ra + rb), p1, p2)
            len2 = _chord_len2_from_degrees(math.degrees(res_rad))
    return xyz_to_cell(center), math.degrees(_chord_len2_to_radians(len2))


# ---------------------------------------------------------------- lat-lng rects

def _cell_latlng(cell: int):
    """(lat_rad, lng_rad) of the cell center."""
    lat, lng = _xyz_to_latlng(cell_to_xyz(cell))
    return math.radians(lat), math.radians(lng)


def _rect_from_cells(lo_cell: int, hi_cell: int):
    """S2LatLngRect from two corner cells (as the s2Rect* functions build)."""
    if not is_valid(lo_cell) or not is_valid(hi_cell):
        raise ValueError("Rectangle is not valid")  # 36
    lat1, lng1 = _cell_latlng(lo_cell)
    lat2, lng2 = _cell_latlng(hi_cell)
    return (lat1, lat2), (lng1, lng2)


def _lng_interval_contains(lo: float, hi: float, lng: float) -> bool:
    if lo > hi:  # inverted interval wraps the date line
        return lng >= lo or lng <= hi
    return lo <= lng <= hi


def rect_contains(lo_cell: int, hi_cell: int, point_cell: int) -> bool:
    """s2RectContains.cpp — S2LatLngRect::Contains(S2LatLng)."""
    (lat_lo, lat_hi), (lng_lo, lng_hi) = _rect_from_cells(lo_cell, hi_cell)
    if not is_valid(point_cell):
        raise ValueError("Point is not valid")  # 36
    plat, plng = _cell_latlng(point_cell)
    return (
        min(lat_lo, lat_hi) <= plat <= max(lat_lo, lat_hi)
        and _lng_interval_contains(lng_lo, lng_hi, plng)
    )


def rect_add(lo_cell: int, hi_cell: int, point_cell: int):
    """s2RectAdd.cpp — S2LatLngRect::AddPoint -> (lo_cell_id, hi_cell_id)."""
    (lat_lo, lat_hi), (lng_lo, lng_hi) = _rect_from_cells(lo_cell, hi_cell)
    if not is_valid(point_cell):
        raise ValueError("Point is not valid")  # 36
    plat, plng = _cell_latlng(point_cell)
    lat_lo2, lat_hi2 = min(lat_lo, plat), max(lat_hi, plat)
    lng_lo2, lng_hi2 = lng_lo, lng_hi
    if not _lng_interval_contains(lng_lo, lng_hi, plng):
        # expand toward the side with the smaller added arc
        d_lo = (lng_lo - plng) % (2 * math.pi)
        d_hi = (plng - lng_hi) % (2 * math.pi)
        if d_lo <= d_hi:
            lng_lo2 = plng
        else:
            lng_hi2 = plng
    return (
        _latlng_to_cell(lat_lo2, lng_lo2),
        _latlng_to_cell(lat_hi2, lng_hi2),
    )


def rect_union(lo1: int, hi1: int, lo2: int, hi2: int):
    """s2RectUnion.cpp -> (lo_cell_id, hi_cell_id) of the bounding union."""
    (a_lat_lo, a_lat_hi), (a_lng_lo, a_lng_hi) = _rect_from_cells(lo1, hi1)
    (b_lat_lo, b_lat_hi), (b_lng_lo, b_lng_hi) = _rect_from_cells(lo2, hi2)
    return (
        _latlng_to_cell(min(a_lat_lo, b_lat_lo), min(a_lng_lo, b_lng_lo)),
        _latlng_to_cell(max(a_lat_hi, b_lat_hi), max(a_lng_hi, b_lng_hi)),
    )


def rect_intersection(lo1: int, hi1: int, lo2: int, hi2: int):
    """s2RectIntersection.cpp -> (lo_cell_id, hi_cell_id) of the overlap."""
    (a_lat_lo, a_lat_hi), (a_lng_lo, a_lng_hi) = _rect_from_cells(lo1, hi1)
    (b_lat_lo, b_lat_hi), (b_lng_lo, b_lng_hi) = _rect_from_cells(lo2, hi2)
    return (
        _latlng_to_cell(max(a_lat_lo, b_lat_lo), max(a_lng_lo, b_lng_lo)),
        _latlng_to_cell(min(a_lat_hi, b_lat_hi), min(a_lng_hi, b_lng_hi)),
    )


def _latlng_to_cell(lat_rad: float, lng_rad: float) -> int:
    return xyz_to_cell(_latlng_to_xyz(math.degrees(lat_rad), math.degrees(lng_rad)))
