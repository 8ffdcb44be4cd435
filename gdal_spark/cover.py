"""Polygon → mixed-resolution cell covers with full/boundary labels.

This is the engine's replacement for the reference's per-feature
spatial-filter pushdown (OGRLayer::Intersection, ogrlayer.cpp:3345+):
instead of installing each geometry as a filter and nested-looping,
every polygon is decomposed ONCE (driver-side, numpy) into a compact
quadtree cover whose cells are labeled:

  full=True  — the cell rectangle lies strictly inside the polygon
               interior: any point in it is inside with NO exact test
               (the analog of GDAL's prepared-geometry Contains
               pretest, ogrlayer.cpp:3489-3503);
  full=False — the cell touches the polygon boundary: candidate points
               need the exact ray-cast kernel.

The cover is an equi-joinable table (poly_id, cell_id, res, full), so
Catalyst plans the spatial prefilter as a broadcast hash join.
Mixed resolution (coarse interior cells, fine boundary cells) keeps
giant polygons from exploding into millions of rows — the skew defense
mandated by the north rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import cells, geometry, wkb

INSIDE, OUTSIDE, BOUNDARY = 1, 0, 2


def classify_rect(
    rings: list[np.ndarray], minx: float, miny: float, maxx: float, maxy: float
) -> int:
    """Rectangle vs polygon(outer+holes): INSIDE / OUTSIDE / BOUNDARY."""
    outer = rings[0]
    ominx, ominy, omaxx, omaxy = geometry.ring_bbox(outer)
    if minx > omaxx or maxx < ominx or miny > omaxy or maxy < ominy:
        return OUTSIDE
    # any outer edge crossing the rect → boundary cell
    if _edges_cross_rect(outer, minx, miny, maxx, maxy):
        return BOUNDARY
    # polygon entirely inside the rect (coarse cell) → boundary
    if ominx >= minx and omaxx <= maxx and ominy >= miny and omaxy <= maxy:
        return BOUNDARY
    # no edge crossing: rect is fully inside or fully outside the outer
    cx, cy = np.array([(minx + maxx) * 0.5]), np.array([(miny + maxy) * 0.5])
    if not geometry.points_in_ring(cx, cy, outer)[0]:
        return OUTSIDE
    # inside outer — consider holes
    for hole in rings[1:]:
        hminx, hminy, hmaxx, hmaxy = geometry.ring_bbox(hole)
        if minx > hmaxx or maxx < hminx or miny > hmaxy or maxy < hminy:
            continue
        if _edges_cross_rect(hole, minx, miny, maxx, maxy):
            return BOUNDARY
        if hminx >= minx and hmaxx <= maxx and hminy >= miny and hmaxy <= maxy:
            return BOUNDARY  # hole entirely within the rect
        if geometry.points_in_ring(cx, cy, hole)[0]:
            return OUTSIDE  # rect swallowed by the hole
    return INSIDE


def _edges_cross_rect(ring, minx, miny, maxx, maxy) -> bool:
    ring = np.asarray(ring, dtype=np.float64)
    if not (ring[0] == ring[-1]).all():
        ring = np.vstack([ring, ring[:1]])
    # vectorized bbox rejection per edge, exact clip test for survivors
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    reject = (
        (np.maximum(x0, x1) < minx)
        | (np.minimum(x0, x1) > maxx)
        | (np.maximum(y0, y1) < miny)
        | (np.minimum(y0, y1) > maxy)
    )
    for i in np.nonzero(~reject)[0]:
        if geometry._seg_intersects_rect(
            x0[i], y0[i], x1[i], y1[i], minx, miny, maxx, maxy
        ):
            return True
    return False


def cover_polygon(
    rings: list[np.ndarray],
    res_min: int = 3,
    res_max: int = 9,
    max_cells: int = 1024,
) -> tuple[np.ndarray, np.ndarray]:
    """Quadtree refinement: (cell_ids, full_flags).

    Starts from the res_min cells over the polygon bbox and refines
    BOUNDARY cells until res_max or the cell budget is reached;
    interior cells stay coarse (compact mixed-res cover)."""
    outer = rings[0]
    minx, miny, maxx, maxy = geometry.ring_bbox(outer)
    frontier = cells.cover_bbox(minx, miny, maxx, maxy, res_min).tolist()
    full: list[int] = []
    boundary: list[int] = []
    res = res_min
    while frontier:
        next_frontier: list[int] = []
        for c in frontier:
            lo_lon, lo_lat, hi_lon, hi_lat = (
                float(v) for v in cells.cell_bounds(np.int64(c))
            )
            cls = classify_rect(rings, lo_lon, lo_lat, hi_lon, hi_lat)
            if cls == INSIDE:
                full.append(c)
            elif cls == BOUNDARY:
                if res < res_max and (
                    len(full) + len(boundary) + len(next_frontier) * 4 < max_cells
                ):
                    next_frontier.extend(cells.children(c).tolist())
                else:
                    boundary.append(c)
        frontier = next_frontier
        res += 1
    cell_ids = np.array(full + boundary, dtype=np.int64)
    flags = np.array([True] * len(full) + [False] * len(boundary), dtype=bool)
    return cell_ids, flags


def _drop_descendants(acc: dict[int, bool]) -> dict[int, bool]:
    """Remove cells having an ancestor in the set (multipart overlap).

    Keeping the coarsest cell is safe: full ancestors accept outright;
    boundary ancestors route the pair to the exact PIP kernel, which
    evaluates ALL parts of the multipolygon."""
    if len(acc) <= 1:
        return acc
    present = set(acc.keys())
    out: dict[int, bool] = {}
    for c, f in acc.items():
        res = c >> 58
        covered = False
        cur = np.int64(c)
        for _ in range(int(res)):
            cur = np.int64(int(cells.parent(cur)))
            if int(cur) in present:
                covered = True
                break
        if not covered:
            out[c] = f
    return out


def cover_polygons_pdf(
    polygons: pd.DataFrame,
    res_min: int = 3,
    res_max: int = 9,
    max_cells: int = 1024,
) -> pd.DataFrame:
    """Cover every polygon → (poly_id, cell_id, res, full) rows.

    Runs on the driver: the polygon side is the small/broadcast side by
    design (the indexed side, like GDAL's method layer)."""
    out_pid, out_cid, out_res, out_full = [], [], [], []
    for pid, buf in zip(polygons["poly_id"], polygons["geom_wkb"]):
        # multipolygon parts are covered independently, then merged so
        # one polygon never emits overlapping cells (a point must match
        # at most ONE cover row per polygon — join-fanout invariant)
        acc: dict[int, bool] = {}
        for rings in wkb.polygon_rings(bytes(buf)):
            cids, flags = cover_polygon(rings, res_min, res_max, max_cells)
            for c, f in zip(cids.tolist(), flags.tolist()):
                acc[c] = acc.get(c, False) or f
        kept = _drop_descendants(acc)
        cids = np.fromiter(kept.keys(), dtype=np.int64, count=len(kept))
        flags = np.fromiter(kept.values(), dtype=bool, count=len(kept))
        res = (cids >> 58).astype(np.int32)
        out_pid.append(np.full(cids.size, pid, dtype=np.int64))
        out_cid.append(cids)
        out_res.append(res)
        out_full.append(flags)
    if not out_pid:
        return pd.DataFrame(
            {"poly_id": [], "cell_id": [], "res": [], "full": []}
        ).astype({"poly_id": "int64", "cell_id": "int64", "res": "int32", "full": "bool"})
    return pd.DataFrame(
        {
            "poly_id": np.concatenate(out_pid),
            "cell_id": np.concatenate(out_cid),
            "res": np.concatenate(out_res),
            "full": np.concatenate(out_full),
        }
    )
