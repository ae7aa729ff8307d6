"""Offline calibration of h3_core's derived _BASE_NEIGHBORS table.

The base-cell neighbor table (H3's baseCellNeighbors/baseCellNeighbor60CCWRots)
is derived in h3_core by folding each base cell's home placement across face
edges. That derivation is exact for hexagon base cells but the 12 pentagon
base cells sit on icosahedron vertices where the fold is distorted (deleted
k-subsequence), so their entries need calibration against ground truth.

Ground truth here is h3_core's own validated projection: geo_to_h3 and
h3_to_geo round-trip exactly (fuzz-tested), so the *geometric* neighbor of a
cell — step the cell's face-frame lattice point one unit, project the stepped
center to lat/lng, snap with geo_to_h3 — is trusted wherever the snap is
exact. For each (base_cell, direction) table entry, we collect res-2 probe
cells whose digit-walk exits through that entry, brute-force the
(neighbor_bc, ccw_rot60) candidate that reproduces the geometric truth for
every probe, and emit the corrected entries as a literal patch dict.

Run:  python tools/h3_calibrate.py   (prints the patch dict for h3_core.py)
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

from clickhouse_23_3_19_32_lts_spark.functions import h3_core as h3


def geo_truth(h: int):
    """Trusted geometric neighbor set of h: face-frame lattice steps whose
    projected centers snap exactly back to a cell center."""
    face, ijk, res = h3._h3_to_face_ijk(h)
    out = set()
    for fd in range(1, 7):
        p = h3._ijk_add(ijk, h3._UNIT_VECS[fd])
        x, y = h3._ijk_to_hex2d(*p)
        lat, lng = h3._hex2d_to_geo(x, y, res, face)
        try:
            n = h3.geo_to_h3(math.degrees(lat), math.degrees(lng), res)
        except Exception:
            continue
        # exact snap: the snapped cell's center must coincide with the
        # stepped lattice point (loose lattices near pentagons won't)
        clat, clng = h3.h3_to_geo(n)
        d = h3._geo_dist_rads(
            lat, lng, math.radians(clat), math.radians(clng)
        )
        # cell circumradius at res ~ 0.007/sqrt7^res… use relative gate:
        step = h3._geo_dist_rads(
            *(math.radians(v) for v in h3.h3_to_geo(h)), lat, lng
        )
        if step > 0 and d < 0.05 * step and n != h:
            out.add(n)
    return out


def walk_exit(h: int, sd: int):
    """Which base-table entry does _h3_neighbor_rotations(h, sd) read?
    Returns (entry_dir, digits_current) or None if it never reaches base."""
    current = h
    direction = sd
    r = h3.get_res(current) - 1
    while True:
        if r == -1:
            bc = h3.get_base_cell(current)
            if h3._BASE_NEIGHBORS[(bc, direction)] is None:
                return 5, current  # deleted-K rewrite reads entry (bc, 5)
            return direction, current
        old_digit = h3._get_digit(current, r + 1)
        is_iii = (r + 1) % 2 == 1
        current = h3._set_digit(
            current, r + 1, h3._NEW_DIGIT[(is_iii, old_digit, direction)]
        )
        nd = h3._NEW_ADJUSTMENT[(is_iii, old_digit, direction)]
        if nd == 0:
            return None
        direction = nd
        r -= 1


def probe_set(bc: int, res: int = 2):
    """(h, sd, truth_set, step_band) probes whose walk reads each entry of
    bc. truth_set is authoritative only when complete (6 exact snaps);
    otherwise the probe constrains by center distance alone (step_band)."""
    by_entry: dict = {d: [] for d in range(1, 7)}
    digit_sets = [
        (d1, d2) for d1 in range(7) for d2 in range(7)
    ] if res == 2 else [
        (d1, d2, d3) for d1 in range(7) for d2 in range(7) for d3 in range(7)
    ]
    for digits in digit_sets:
        hh = h3._make_h3(res, bc, digits)
        if bc in h3.PENTAGON_CELLS and h3._leading_nonzero_digit(hh) == 1:
            continue  # deleted subsequence — not a cell
        truth = None
        for sd in range(1, 7):
            if bc in h3.PENTAGON_CELLS and h3.is_pentagon(hh) and sd == 1:
                continue
            ex = walk_exit(hh, sd)
            if ex is None:
                continue
            if truth is None:
                truth = geo_truth(hh)
            clat, clng = h3.h3_to_geo(hh)
            steps = sorted(
                h3._geo_dist_rads(
                    math.radians(clat), math.radians(clng),
                    *(math.radians(v) for v in h3.h3_to_geo(n)),
                )
                for n in truth
            )
            med = steps[len(steps) // 2] if steps else None
            by_entry[ex[0]].append((hh, sd, truth, med))
    return by_entry


def run_entry(h: int, sd: int):
    try:
        nb, _ = h3._h3_neighbor_rotations(h, sd, 0)
        return nb
    except h3.PentagonDistortion:
        return None


def bc_candidates(bc: int):
    """Base cells geometrically adjacent to bc (candidate neighbors)."""
    lat, lng = h3._BASE_CELL_GEO[bc]
    ds = []
    for o in range(h3.NUM_BASE_CELLS):
        if o == bc:
            continue
        olat, olng = h3._BASE_CELL_GEO[o]
        ds.append((h3._geo_dist_rads(lat, lng, olat, olng), o))
    ds.sort()
    gate = ds[0][0] * 1.5
    return [o for d, o in ds if d <= gate]


def main() -> None:
    patch = {}
    n_checked = n_bad = 0
    for bc in range(h3.NUM_BASE_CELLS):
        probes = probe_set(bc)
        cands = None
        for dr in range(1, 7):
            cur = h3._BASE_NEIGHBORS[(bc, dr)]
            if cur is None:
                continue  # pentagon deleted-K: stays None
            entry_probes = probes[dr]
            if not entry_probes:
                continue
            n_checked += 1

            def score(nbc: int, rot: int) -> bool:
                h3._BASE_NEIGHBORS[(bc, dr)] = (nbc, rot)
                try:
                    for hh, sd, truth, med in entry_probes:
                        got = run_entry(hh, sd)
                        if got is None:
                            return False
                        if len(truth) == 6:
                            if got not in truth:
                                return False
                        elif med is not None:
                            clat, clng = h3.h3_to_geo(hh)
                            glat, glng = h3.h3_to_geo(got)
                            d = h3._geo_dist_rads(
                                math.radians(clat), math.radians(clng),
                                math.radians(glat), math.radians(glng),
                            )
                            if not (0.5 * med <= d <= 1.6 * med):
                                return False
                    return True
                finally:
                    h3._BASE_NEIGHBORS[(bc, dr)] = cur

            if score(*cur):
                continue
            # current entry fails — brute-force the fix
            if cands is None:
                cands = bc_candidates(bc)
            found = []
            for nbc in cands:
                for rot in range(6):
                    if score(nbc, rot):
                        found.append((nbc, rot))
            n_bad += 1
            if len(found) == 1:
                patch[(bc, dr)] = found[0]
                h3._BASE_NEIGHBORS[(bc, dr)] = found[0]
                print(f"fixed ({bc},{dr}): {cur} -> {found[0]}", file=sys.stderr)
            else:
                print(
                    f"AMBIGUOUS ({bc},{dr}): {cur} -> {found}", file=sys.stderr
                )
    print(f"checked {n_checked} entries, {n_bad} bad", file=sys.stderr)
    print("_BASE_NEIGHBOR_PATCH = {")
    for (bc, dr), v in sorted(patch.items()):
        print(f"    ({bc}, {dr}): {v},")
    print("}")


if __name__ == "__main__":
    main()
