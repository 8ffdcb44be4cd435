"""STR-packed (Sort-Tile-Recursive) static bbox R-tree.

Spark-first analog of the reference's bulk-loaded GeoPackage R*Tree
(ogr/ogrsf_frmts/gpkg/ogrgeopackagetablelayer.cpp:21 "bulk load" path)
and the shapefile .qix packed quadtree: built once on the driver over
the small (polygon) side, pickled into a Spark broadcast variable, and
queried inside vectorized UDFs. Pure numpy; query returns candidate
row indices whose bboxes intersect the probe bbox.
"""

from __future__ import annotations

import numpy as np

_NODE_CAP = 16


class STRtree:
    """Static packed R-tree over N bboxes (minx, miny, maxx, maxy)."""

    def __init__(self, boxes: np.ndarray):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = boxes.shape[0]
        self.leaf_boxes = boxes
        # --- STR packing: sort by center-x into vertical slices, then
        # by center-y within each slice (Leutenegger et al. 1997).
        if self.n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels: list[np.ndarray] = []
            return
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        n_leaves = int(np.ceil(self.n / _NODE_CAP))
        n_slices = int(np.ceil(np.sqrt(n_leaves)))
        slice_cap = n_slices * _NODE_CAP
        by_x = np.argsort(cx, kind="stable")
        order = np.empty(self.n, dtype=np.int64)
        pos = 0
        for s in range(0, self.n, slice_cap):
            chunk = by_x[s : s + slice_cap]
            chunk = chunk[np.argsort(cy[chunk], kind="stable")]
            order[pos : pos + len(chunk)] = chunk
            pos += len(chunk)
        self.order = order
        sorted_boxes = boxes[order]

        # --- build level-by-level parent bboxes (implicit tree)
        self.levels = []
        cur = sorted_boxes
        while cur.shape[0] > 1:
            n_parent = int(np.ceil(cur.shape[0] / _NODE_CAP))
            parent = np.empty((n_parent, 4), dtype=np.float64)
            for p in range(n_parent):
                grp = cur[p * _NODE_CAP : (p + 1) * _NODE_CAP]
                parent[p, 0] = grp[:, 0].min()
                parent[p, 1] = grp[:, 1].min()
                parent[p, 2] = grp[:, 2].max()
                parent[p, 3] = grp[:, 3].max()
            self.levels.append(parent)
            cur = parent
        self.sorted_boxes = sorted_boxes

    def query(self, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
        """Indices (into the original box array) intersecting the probe.

        Implicit-tree descent: node p at level k (levels[k]) groups
        entries [p*cap, (p+1)*cap) of the level below (level -1 = the
        sorted leaves)."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        # start from the topmost level (or leaves if the tree is tiny)
        if self.levels:
            top = self.levels[-1]
            nodes = np.nonzero(
                (top[:, 0] <= maxx)
                & (top[:, 2] >= minx)
                & (top[:, 1] <= maxy)
                & (top[:, 3] >= miny)
            )[0]
            for level_idx in range(len(self.levels) - 2, -2, -1):
                child = (
                    self.levels[level_idx] if level_idx >= 0 else self.sorted_boxes
                )
                kids = (nodes[:, None] * _NODE_CAP + np.arange(_NODE_CAP)).ravel()
                kids = kids[kids < child.shape[0]]
                b = child[kids]
                m = (
                    (b[:, 0] <= maxx)
                    & (b[:, 2] >= minx)
                    & (b[:, 1] <= maxy)
                    & (b[:, 3] >= miny)
                )
                nodes = kids[m]
            return self.order[nodes]
        b = self.sorted_boxes
        m = (
            (b[:, 0] <= maxx)
            & (b[:, 2] >= minx)
            & (b[:, 1] <= maxy)
            & (b[:, 3] >= miny)
        )
        return self.order[np.nonzero(m)[0]]

    def query_many(self, boxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch query: (probe_idx, tree_idx) candidate pairs."""
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        pi, ti = [], []
        for i in range(boxes.shape[0]):
            hits = self.query(*boxes[i])
            if hits.size:
                pi.append(np.full(hits.size, i, dtype=np.int64))
                ti.append(hits)
        if not pi:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(pi), np.concatenate(ti)
